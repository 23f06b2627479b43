package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Rolling 64-bit polynomial hashes of every k-char window of a string —
  * the native gram-key producer for the hashed (scale-path) side of
  * [[graft.ops.SubstrDedup]].
  *
  * The column formulation materializes every window as its own k-char
  * substring (`transform(sequence(...), i => substr(text, i, k))` — an
  * O(n·k) allocation storm: a 2 KB document yields ~2000 20-char string
  * copies) and then hashes each. The kernel is ONE O(n) pass: h_{i+1} =
  * (h_i − c_i·B^{k−1})·B + c_{i+k} over the char sequence, no substring
  * ever allocated. Like the xxhash64 gram keys it replaces, a hash
  * collision can only ADD a duplicated span (never miss one), so the
  * hashed dedup stays span-conservative; `SubstrDedupSpec` pins
  * hashed ≡ exact on the real corpus either way.
  *
  * Windows are CHARACTER-positioned (same 1-based positions as SQL
  * `substr`, hash i covers chars [i+1, i+k] for array index i), so span
  * arithmetic downstream is unchanged. Documents shorter than k yield an
  * empty array; null in → null out.
  */
object GramHashKernel {
  private val B = 1000003L

  def hashes(s: UTF8String, k: Int): ArrayData = {
    // CODE POINTS, not UTF-16 units: SQL substr/length count code points,
    // and the hashed windows must sit at the same character positions the
    // exact (substr-based) path uses, or spans would shift on non-BMP text
    val cps = s.toString.codePoints().toArray
    val n = cps.length
    if (n < k) return new GenericArrayData(Array.empty[Long])
    var bk = 1L // B^(k-1)
    var t = 1
    while (t < k) { bk *= B; t += 1 }
    val out = new Array[Long](n - k + 1)
    var h = 0L
    var i = 0
    while (i < k) { h = h * B + cps(i); i += 1 }
    out(0) = h
    while (i < n) {
      h = (h - cps(i - k) * bk) * B + cps(i)
      out(i - k + 1) = h
      i += 1
    }
    new GenericArrayData(out)
  }
}

case class GramHashes(child: Expression, k: Int)
    extends UnaryExpression with ImplicitCastInputTypes {

  require(k >= 2, s"window length k=$k must be >= 2")

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_gram_hashes"

  override def nullSafeEval(input: Any): Any =
    GramHashKernel.hashes(input.asInstanceOf[UTF8String], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = org.apache.spark.sql.graft.GramHashKernel.hashes($c, $k);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object GramHashes {
  def gramHashes(text: Column, k: Int): Column =
    ExpressionUtils.column(GramHashes(ExpressionUtils.expression(text), k))
}
