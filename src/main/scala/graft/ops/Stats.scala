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

  /** Two-sample distribution-drift test between corpus snapshots (this
    * week's crawl vs the retained training distribution) in ENGINE-EXACT
    * integer arithmetic — the re-mix / re-train trigger of a data pipeline,
    * as a fixed-bin chi-square statistic instead of the float-log PSI
    * (whose `ln` differs across engines in the last ulp; the chi-square
    * summand is rational, so it cannot).
    *
    * Values are cent-quantized and binned on a CALLER-FIXED grid
    * (`loCents + k·widthCents`, `buckets` bins, outliers clamped into the
    * edge bins) — fixed bins are what makes two INDEPENDENTLY computed
    * snapshot histograms comparable, and the grid is the published contract
    * of the drift monitor. Per occupied bin, with side counts (c_a, c_b)
    * and side totals (N_A, N_B), the exact 2×B-table identity
    *
    *   χ² = Σ_b (c_a·N_B − c_b·N_A)² / ((c_a+c_b)·N_A·N_B)
    *
    * gives the per-bin term; `chi2_term_micro` is its 10⁶-scaled truncating
    * integer division — every product an exact DECIMAL(38,0)/HUGEINT, every
    * output a long (the term is bounded by 10⁶·N). Σ over bins ≈ 10⁶·χ²
    * (per-bin floor truncation only).
    *
    * Scale shape: ONE scan per snapshot (union with a side tag), ONE
    * map-side-combined groupBy(bin) carrying two conditional counts — the
    * full-outer "join" of the two histograms happens inside the same
    * aggregation for free — and side totals via a single-partition window
    * over the ≤ `buckets`-row histogram (the [[histogramPercentiles]]
    * bounded-window trick: the window is over the histogram, not the
    * data, so one reducer holds ≤ `buckets` longs). Nothing downstream of
    * the two scans is data-sized, and nothing is computed twice.
    * Headroom: (c·N)² rides DECIMAL(38,0) — exact up to ~10⁸ rows per
    * snapshot; past that the query RAISES (overflow-null is coalesced into
    * raise_error, never a silent NULL term) — drift-monitor on a hash
    * sample instead (the statistic is about distributions, not row
    * identity).
    */
  /** The drift grid's binning projection — shared verbatim by the batch
    * test and the streaming monitor so the two can never disagree on a
    * boundary: cent-quantize, fixed grid from `loCents` at `widthCents`,
    * outliers clamped into the edge bins.
    */
  private[graft] def gridBin(valueCol: String, loCents: Long,
      widthCents: Long, buckets: Int): org.apache.spark.sql.Column =
    least(greatest(
      expr(s"(cast(floor(`$valueCol` * 100) as bigint) - ${loCents}L) div ${widthCents}L"),
      lit(0L)), lit(buckets - 1L))

  def chiSquareDrift(a: DataFrame, b: DataFrame, valueCol: String,
      loCents: Long, widthCents: Long, buckets: Int): DataFrame = {
    require(widthCents > 0, s"widthCents must be positive, got $widthCents")
    require(buckets > 1, s"buckets must exceed 1, got $buckets")
    val dec = "decimal(38,0)"
    def binned(df: DataFrame, side: Int) =
      df.filter(col(valueCol).isNotNull)
        .select(gridBin(valueCol, loCents, widthCents, buckets).as("bin"),
          lit(side).as("__side"))
    val joined = binned(a, 0).union(binned(b, 1))
      .groupBy("bin")
      .agg(sum(when(col("__side") === 0, 1L).otherwise(0L)).as("cnt_a"),
        sum(when(col("__side") === 1, 1L).otherwise(0L)).as("cnt_b"))
    val all = Window.partitionBy().rowsBetween(
      Window.unboundedPreceding, Window.unboundedFollowing)
    joined
      .withColumn("__na", sum(col("cnt_a")).over(all))
      .withColumn("__nb", sum(col("cnt_b")).over(all))
      .withColumn("__d",
        (col("cnt_a").cast(dec) * col("__nb").cast(dec) -
          col("cnt_b").cast(dec) * col("__na").cast(dec)).cast(dec))
      // envelope guard: past ~1e8 rows per snapshot 10⁶·(c·N)² reaches
      // 10³⁸ and non-ANSI Spark's DECIMAL(38,0) products overflow to NULL
      // (DuckDB's HUGEINT keeps exact values to 2^127) — a silent NULL
      // term reads as "no drift", so the breach must fail LOUDLY instead:
      // coalesce routes any overflow-null into raise_error. The
      // denominator rides DECIMAL too (as longs it would WRAP silently at
      // the same scale rather than null out). In-range quotients are
      // unchanged — integral div of the same exact integers.
      .withColumn("chi2_term_micro",
        when(col("__na") > 0 && col("__nb") > 0,
          coalesce(
            expr("cast((1000000 * __d * __d) div " +
              "(cast(cnt_a + cnt_b as decimal(38,0)) * cast(__na as decimal(38,0)) " +
              " * cast(__nb as decimal(38,0))) as bigint)"),
            expr("cast(raise_error('chiSquareDrift: DECIMAL(38,0) overflow — " +
              "snapshot exceeds the ~1e8-rows-per-side envelope; " +
              "drift-monitor a hash sample instead') as bigint)")))
          .otherwise(lit(0L)))
      .select(col("bin"), col("cnt_a"), col("cnt_b"), col("chi2_term_micro"))
  }
}
