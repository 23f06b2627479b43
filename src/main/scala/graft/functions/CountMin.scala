package graft.functions

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Count-Min sketch: fixed-size (depth × width) frequency summary with
  * one-sided error — estimates never undercount, and overcount by at most
  * εN (ε ≈ e/width) with probability 1−δ (δ ≈ e^−depth). The complement to
  * [[FreqItems]]' Misra-Gries: MG answers "what are the heavy items",
  * CMS answers "how often is THIS item" for any item, including ones never
  * enumerated.
  *
  * Scale: the buffer is depth·width longs regardless of stream size or
  * cardinality, merged by element-wise addition — a textbook mergeable
  * partial aggregate (map-side combine, one small reducer object). Items
  * enter as LONGS: hash strings upstream (`xxhash64` or `Text.h32`), the
  * same contract as the TopK/FreqItems surfaces.
  */
object CountMin {

  /** Row hashes: multiply-shift with fixed odd constants — deterministic
    * across JVMs/runs (no Random), pairwise-independent enough for the CMS
    * bounds in practice.
    */
  private def bucket(d: Int, x: Long, width: Int): Int = {
    val a = 0x9E3779B97F4A7C15L + 2L * d // odd multiplier per row
    val h = a * (x ^ (x >>> 33)) + (0xC2B2AE3D27D4EB4FL * (d + 1))
    (((h >>> 17) % width).toInt + width) % width
  }

  class CountMinSketch(depth: Int, width: Int)
      extends Aggregator[Long, Array[Long], Seq[Long]] {
    require(depth >= 1 && width >= 2, s"bad CMS shape $depth x $width")
    override def zero: Array[Long] = new Array[Long](depth * width)
    override def reduce(buf: Array[Long], x: Long): Array[Long] = {
      var d = 0
      while (d < depth) { buf(d * width + bucket(d, x, width)) += 1; d += 1 }
      buf
    }
    override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
      var i = 0
      while (i < a.length) { a(i) += b(i); i += 1 }
      a
    }
    override def finish(r: Array[Long]): Seq[Long] = r.toSeq
    override def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
    override def outputEncoder: Encoder[Seq[Long]] = ExpressionEncoder[Seq[Long]]()
  }

  /** Aggregate a long-item column into a CMS (array<long> of depth·width). */
  def sketch(depth: Int, width: Int): Column => Column = {
    val fn = udaf(new CountMinSketch(depth, width), ExpressionEncoder[Long]())
    item => fn(item)
  }

  /** Point estimate: min over the item's depth counters. */
  def estimate(sk: Seq[Long], depth: Int, width: Int, item: Long): Long = {
    require(sk.length == depth * width, s"sketch shape mismatch: ${sk.length} vs $depth x $width")
    (0 until depth).map(d => sk(d * width + bucket(d, item, width))).min
  }
}
