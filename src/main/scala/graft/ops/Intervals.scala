package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Bucketed interval (range/theta) join: points `p` against half-open
  * intervals `[start, end)` with NO equi key.
  *
  * Written naively (`pts.join(iv, p >= s && p < e)`), Catalyst has no equi
  * condition to hash or sort on and plans a BroadcastNestedLoopJoin (or a
  * cartesian product when both sides are big) — O(|pts|·|iv|) comparisons,
  * the canonical 100 TB cliff. This operator manufactures the equi key:
  *
  *  1. pick a bucket width W (same units as the point column — the caller's
  *     time/space granularity knob);
  *  2. each interval explodes into the buckets it covers
  *     (`floor(s/W) .. floor((e-1)/W)` — fan-out = ceil(len/W), bounded by
  *     `maxBucketsPerInterval` so one pathological interval can't blow up
  *     the shuffle);
  *  3. each point lands in exactly ONE bucket (`floor(p/W)`), so after the
  *     bucket equi-join + residual range filter every qualifying
  *     (point, interval) pair appears exactly once — no distinct needed.
  *
  * The join is now a plain shuffle/broadcast HASH join on `__bucket` that
  * AQE can size — partition count scales with data, not with |pts|·|iv|.
  * Pick W near the typical interval length: W too small multiplies the
  * interval side, W too large piles unrelated points into one bucket and
  * shifts work to the residual filter.
  *
  * Domain: non-negative long point/bound values (epoch millis/micros —
  * `div` truncation equals floor division there). Callers with signed
  * domains should shift first.
  */
object Intervals {

  def bucketedIntervalJoin(points: DataFrame, ptCol: String,
      intervals: DataFrame, startCol: String, endCol: String,
      bucketWidth: Long, maxBucketsPerInterval: Int = 4096): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth must be positive, got $bucketWidth")
    // `div` (integer division) in SQL text: Column has no integral-divide
    // method, and floor(a/b) through doubles loses exactness past 2^53
    // (epoch-nanos territory)
    def b(sqlExpr: String): Column = expr(s"CAST(($sqlExpr) DIV ${bucketWidth}L AS LONG)")
    val iv = intervals
      .filter(col(endCol) > col(startCol)) // empty/inverted intervals match nothing
      .withColumn("__nb", b(s"`$endCol` - 1L") - b(s"`$startCol`") + 1)
    // fail loudly instead of silently skewing the shuffle: an interval
    // spanning more than maxBucketsPerInterval buckets means W is mis-sized
    val guarded = iv.withColumn("__nb",
      when(col("__nb") <= maxBucketsPerInterval, col("__nb"))
        .otherwise(raise_error(concat(
          lit(s"interval spans more than $maxBucketsPerInterval buckets of $bucketWidth: "),
          col(startCol).cast("string"), lit(".."), col(endCol).cast("string")))))
      .withColumn("__bucket", explode(sequence(b(s"`$startCol`"), b(s"`$startCol`") + col("__nb") - 1)))
      .drop("__nb")
    points.withColumn("__bucket", b(s"`$ptCol`"))
      .join(guarded, Seq("__bucket"))
      .filter(col(ptCol) >= col(startCol) && col(ptCol) < col(endCol))
      .drop("__bucket")
  }
}
