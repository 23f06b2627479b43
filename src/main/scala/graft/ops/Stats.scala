package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.ops.Text.floor6

/** Scale-safe distribution statistics.
  *
  * The oracle-exact percentile demo (`stats_percentiles`,
  * RelationalQueries) materializes each group's full value list in one
  * `collect_list` buffer — correct, but one reducer holds O(group) doubles,
  * the classic exact-percentile OOM at corpus scale. This module is the
  * engine surface a 100 TB pipeline actually calls:
  *
  *  - [[histogramPercentiles]]: two scans, every aggregation partial +
  *    mergeable, per-reducer state bounded by the fixed bucket count B.
  *    The estimate is the standard within-bucket linear interpolation —
  *    a DETERMINISTIC function of (min, width, bucket counts), so the
  *    DuckDB oracle reproduces it bit-for-bit (hash-exact green), unlike
  *    sketch-based `approx_percentile` whose error is implementation-
  *    defined. Estimator error is bounded by the bucket width
  *    (max-min)/B.
  *  - [[approxPercentiles]]: Spark's native KLL-style sketch for when a
  *    relative-rank error bound matters more than engine portability.
  */
object Stats {

  /** Histogram-interpolated percentiles per group.
    *
    * Shape (all 100 TB-safe):
    *   1. per-group (n, min, max) — partial agg, result is |groups| rows,
    *      broadcast back;
    *   2. fixed-width bucket counts — partial agg, |groups|×B rows;
    *   3. cumulative counts — a Window, but partitions are ≤ B rows by
    *      construction (the histogram, not the data), so no reducer ever
    *      holds more than B longs;
    *   4. containing-bucket pick + interpolation — arithmetic on the
    *      |groups|×B table.
    *
    * For percentile p with target rank t = p·n, the estimate inside the
    * first bucket whose cumulative count reaches t is
    * `min + w·(b + (t − below)/cnt_b)`; degenerate groups (min = max) give
    * min. Output: (groupCol, p_<label> per requested p), floor6-stabilized.
    *
    * Error bound: the estimate lands in the bucket holding the rank-⌈p·n⌉
    * order statistic, so it is within ONE bucket width of that value. (A
    * sorted-list interpolated quantile can sit further away when adjacent
    * order statistics straddle empty buckets in a sparse tail — the bound
    * is on the order statistic, not the interpolation.)
    */
  def histogramPercentiles(df: DataFrame, groupCol: String, valueCol: String,
      ps: Seq[(String, Double)], buckets: Int = 256): DataFrame = {
    require(buckets > 0 && ps.nonEmpty)
    val v = col(valueCol)
    val rows = df.filter(v.isNotNull).select(col(groupCol), v.as("__v"))
    val stats = rows.groupBy(groupCol).agg(
      count(lit(1)).as("__n"), min(col("__v")).as("__mn"), max(col("__v")).as("__mx"))
      .withColumn("__w", (col("__mx") - col("__mn")) / lit(buckets.toDouble))
    val bucket = when(col("__w") === 0.0, lit(0L)).otherwise(
      least(floor((col("__v") - col("__mn")) / col("__w")).cast("long"),
        lit(buckets.toLong - 1)))
    val hist = rows.join(broadcast(stats), groupCol)
      .select(col(groupCol), bucket.as("__b"))
      .groupBy(groupCol, "__b").agg(count(lit(1)).as("__cnt"))
    val cum = hist.withColumn("__cum",
      sum(col("__cnt")).over(Window.partitionBy(groupCol).orderBy("__b")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .join(broadcast(stats), groupCol)
    val perP = ps.map { case (label, p) =>
      val t = lit(p) * col("__n").cast("double")
      cum.filter(col("__cum").cast("double") >= t)
        .groupBy(groupCol)
        .agg(min_by(struct(col("__b"), col("__cnt"), col("__cum"), col("__mn"),
          col("__w"), col("__n")), col("__b")).as("__s"))
        .select(col(groupCol),
          floor6(when(col("__s.__w") === 0.0, col("__s.__mn")).otherwise(
            col("__s.__mn") + col("__s.__w") * (col("__s.__b").cast("double") +
              (lit(p) * col("__s.__n").cast("double") -
                (col("__s.__cum") - col("__s.__cnt")).cast("double")) /
                col("__s.__cnt").cast("double")))).as(s"p_$label"))
    }
    perP.reduce(_.join(_, groupCol))
  }

  /** Spark's native mergeable quantile sketch (one pass, relative-rank
    * error ≤ 1/accuracy) — the surface to prefer when portability of the
    * exact estimate doesn't matter. No DuckDB oracle: the sketch's results
    * are implementation-defined.
    */
  def approxPercentiles(df: DataFrame, groupCol: String, valueCol: String,
      ps: Seq[Double], accuracy: Int = 10000): DataFrame =
    df.filter(col(valueCol).isNotNull)
      .groupBy(groupCol)
      .agg(percentile_approx(col(valueCol), array(ps.map(lit): _*), lit(accuracy))
        .as("percentiles"))
}
