package graft.functions

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Bounded top-k aggregation: keep the k best (score DESC, id ASC) pairs
  * per group, merged associatively.
  *
  * This is the scale-safe replacement for `row_number().over(Window
  * .partitionBy(group))` + `filter(rnk <= k)`: the window form shuffles a
  * group's ENTIRE candidate list to one reducer (one-reducer-per-query
  * ceiling), while an Aggregator partial-aggregates map-side — each
  * partition contributes at most k pairs per group to the shuffle, so
  * reducer input is bounded by k × partitions regardless of corpus size.
  */
object TopK {

  /** Sort by score descending, ties broken by ascending id — identical to
    * `orderBy(col(score).desc, col(id))`.
    */
  private val ord: Ordering[(Double, Long)] =
    Ordering.Tuple2(Ordering[Double].reverse, Ordering[Long])

  /** Buffer is a k-bounded sorted list; inserts keep it tiny (k ~ 5-100),
    * so the O(k) insertion is cheaper than heap bookkeeping at these sizes.
    *
    * Ids are kept DISTINCT: a duplicate candidate (same id, e.g. reached via
    * two probe lists) keeps its better-ranked entry instead of occupying two
    * top-k slots. Exact for equal-score duplicates — the only kind candidate
    * generation produces.
    */
  class TopKByScore(k: Int)
      extends Aggregator[(Double, Long), List[(Double, Long)], Seq[(Double, Long)]] {
    require(k > 0, s"topK needs k > 0, got $k")
    private def insert(buf: List[(Double, Long)], a: (Double, Long)): List[(Double, Long)] =
      buf.find(_._2 == a._2) match {
        case Some(e) if ord.lteq(e, a) => buf
        case Some(_) => ((a :: buf.filterNot(_._2 == a._2)).sorted(ord)).take(k)
        case None =>
          if (buf.lengthCompare(k) >= 0 && ord.gteq(a, buf.last)) buf
          else ((a :: buf).sorted(ord)).take(k)
      }
    override def zero: List[(Double, Long)] = Nil
    override def reduce(buf: List[(Double, Long)], a: (Double, Long)): List[(Double, Long)] =
      insert(buf, a)
    override def merge(b1: List[(Double, Long)], b2: List[(Double, Long)]): List[(Double, Long)] =
      b2.foldLeft(b1)(insert)
    override def finish(r: List[(Double, Long)]): Seq[(Double, Long)] = r.sorted(ord)
    override def bufferEncoder: Encoder[List[(Double, Long)]] =
      ExpressionEncoder[List[(Double, Long)]]()
    override def outputEncoder: Encoder[Seq[(Double, Long)]] =
      ExpressionEncoder[Seq[(Double, Long)]]()
  }

  /** Untyped column form: `topK(5)(col("cos"), col("neighbor_id"))` returns
    * an array of (score, id) structs, best first. Explode with `posexplode`
    * to recover the 1-based rank.
    *
    * Typing contract: the score column must cast to DOUBLE and the id
    * column to LONG (the input encoder is (Double, Long)) — string/UUID
    * ids need a surrogate long key first (see `graft.ops.Keys
    * .withSurrogateId`). Callers guard with [[requireIntegralId]].
    */
  def topK(k: Int): (Column, Column) => Column = {
    val fn = udaf(new TopKByScore(k), ExpressionEncoder[(Double, Long)]())
    (score, id) => fn(score, id)
  }

  /** Fail fast when an id column can't ride the (Double, Long) encoder: a
    * string/UUID id would cast to null and silently collapse all groups.
    */
  def requireIntegralId(schema: org.apache.spark.sql.types.StructType,
      idCol: String, op: String): Unit = {
    import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType}
    val idType = schema(idCol).dataType
    require(Seq(ByteType, ShortType, IntegerType, LongType).contains(idType),
      s"$op needs an integral id column (TopK ranks (Double, Long) pairs), " +
        s"got $idCol: $idType. Map string/UUID ids through " +
        "graft.ops.Keys.withSurrogateId first.")
  }
}
