package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series regularization: resample an irregular event stream onto a
  * fixed bucket grid per key, forward-filling gaps with the last observed
  * value — the feature-engineering step that turns raw event logs into
  * aligned model inputs.
  *
  * Scale shape:
  *  - last-observation-per-bucket: one groupBy (key, bucket) with a
  *    map-side-combined `max(struct(ts, id, value))` — deterministic
  *    survivor under ties, no window over raw events;
  *  - the bucket grid is generated per key from its own (min, max) bucket
  *    range (`sequence` + explode) — fan-out is span/step per key, a knob,
  *    not a global cross join against a calendar table;
  *  - forward fill is `last(value, ignoreNulls)` over a window PARTITIONED
  *    BY KEY — parallel across keys; state is one key's grid, bounded by
  *    span/step.
  *
  * The first bucket of every key is observed by construction (the grid
  * starts at the key's own min), so `filled` is never null.
  */
object TimeSeries {

  /** (keyCol, bucket, filled, observed): one row per key per `stepUs`
    * bucket between the key's first and last event; `filled` carries the
    * last observed value at-or-before the bucket, `observed` marks buckets
    * with their own event. `tsCol` must be epoch-micros (long); `ordCol`
    * breaks exact-timestamp ties deterministically.
    */
  def resampleFill(df: DataFrame, keyCol: String, tsCol: String, ordCol: String,
      valueCol: String, stepUs: Long): DataFrame = {
    require(stepUs > 0, s"stepUs must be positive, got $stepUs")
    val obs = df.filter(col(valueCol).isNotNull)
      // exact integer bucket division (a double quotient could land on the
      // wrong side of a boundary in the last ulp; `div` cannot)
      .select(col(keyCol), expr(s"`$tsCol` div ${stepUs}L").as("bucket"),
        col(tsCol).as("__ts"), col(ordCol).as("__ord"), col(valueCol).as("__v"))
    val lastPerBucket = obs
      .groupBy(keyCol, "bucket")
      .agg(max(struct(col("__ts"), col("__ord"), col("__v"))).getField("__v").as("obs_v"))
    val grid = obs.groupBy(keyCol)
      .agg(min("bucket").as("b0"), max("bucket").as("b1"))
      .select(col(keyCol), explode(sequence(col("b0"), col("b1"))).as("bucket"))
    val w = Window.partitionBy(keyCol).orderBy("bucket")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid.join(lastPerBucket, Seq(keyCol, "bucket"), "left")
      .select(col(keyCol), col("bucket"),
        last(col("obs_v"), ignoreNulls = true).over(w).as("filled"),
        col("obs_v").isNotNull.as("observed"))
  }

  /** Trailing moving average over an already-regular series (e.g.
    * [[resampleFill]] output): mean of the last `width` buckets including
    * the current one (fewer at the head). Window partitioned by key —
    * parallel across keys, frame state bounded by `width`.
    */
  def movingAvg(df: DataFrame, keyCol: String, bucketCol: String,
      valCol: String, width: Int): DataFrame = {
    require(width > 0, s"width must be positive, got $width")
    val w = Window.partitionBy(keyCol).orderBy(bucketCol)
      .rowsBetween(-(width - 1), Window.currentRow)
    df.select(col(keyCol), col(bucketCol), col(valCol))
      .withColumn("ma", avg(col(valCol)).over(w))
  }

  /** Cohort retention: bucket each user's FIRST activity (their cohort),
    * then count, for each bucket offset `period` ≥ 0, how many of the
    * cohort's users were active in that bucket — the standard
    * triangle-retention matrix over an event log.
    *
    * Scale shape: ONE wide shuffle (groupBy user) whose per-user state is
    * the `collect_set` of distinct active buckets — bounded by
    * horizon/stepUs, a knob, not data-sized — with map-side partial
    * dedup; the second aggregation runs on |cohorts|·|periods| rows.
    * No self-join of events against first-activity, no distinct-count
    * over raw events.
    *
    * `tsCol` must be epoch-micros (long). Output:
    * (cohort  — first-activity bucket index = ts div stepUs,
    *  period  — bucket − cohort, 0 for the cohort's own bucket,
    *  active_users — exact distinct users of that cohort active then).
    */
  def cohortRetention(df: DataFrame, userCol: String, tsCol: String,
      stepUs: Long): DataFrame = {
    require(stepUs > 0, s"stepUs must be positive, got $stepUs")
    df.select(col(userCol), expr(s"`$tsCol` div ${stepUs}L").as("bucket"))
      .groupBy(userCol)
      .agg(collect_set(col("bucket")).as("__bs"))
      .select(array_min(col("__bs")).as("cohort"), explode(col("__bs")).as("__b"))
      .groupBy(col("cohort"), (col("__b") - col("cohort")).as("period"))
      .agg(count(lit(1)).as("active_users"))
  }

  /** Rolling z-score anomaly detection with ENGINE-EXACT arithmetic: flag
    * a value whose deviation from the trailing `width`-row mean exceeds
    * `k` standard deviations — without ever computing a float mean or a
    * sqrt. Values are cent-quantized (`floor(v·100)` as long; IEEE-exact
    * on any engine), and the flag is the integer inequality
    *
    *   (n·x − s)² > k²·(n·s2 − s²)      over the trailing frame,
    *
    * which is |x − mean| > k·stddev_pop cleared of denominators — every
    * term an exact long, so the DuckDB oracle matches bit-for-bit where a
    * float stddev would differ in the last ulp. Rows with fewer than
    * `width` predecessors are never flagged (`n` is also returned so the
    * caller can tell "not anomalous" from "not enough history").
    *
    * Scale shape: one exchange on `keyCol`, one ordered window whose frame
    * state is `width` longs; per-key data, never global. Quantized-value
    * bound: |v| < 9·10⁵ keeps n·s2·k² inside a long for width ≤ 8, k ≤ 3
    * (documented, not data-checked — the caller picks the quantization).
    */
  def rollingAnomalies(df: DataFrame, keyCol: String, tsCol: String,
      ordCol: String, valueCol: String, width: Int, k: Int): DataFrame = {
    require(width > 0 && width <= 64, s"width must be in [1,64], got $width")
    require(k > 0, s"k must be positive, got $k")
    val order = Window.partitionBy(keyCol).orderBy(col(tsCol), col(ordCol))
    val frame = order.rowsBetween(-width, -1)
    val n = lit(width.toLong)
    df.withColumn("__x", floor(col(valueCol) * lit(100)).cast("long"))
      .withColumn("__n", count(col("__x")).over(frame))
      .withColumn("__s", sum(col("__x")).over(frame))
      .withColumn("__s2", sum(col("__x") * col("__x")).over(frame))
      .withColumn("anomaly",
        col("__n") === n &&
          (n * col("__x") - col("__s")) * (n * col("__x") - col("__s")) >
            lit(k.toLong * k) * (n * col("__s2") - col("__s") * col("__s")))
      .withColumn("hist_n", col("__n"))
      .drop("__x", "__n", "__s", "__s2")
  }

  /** Two-sided CUSUM changepoint detection (Page 1954) in ENGINE-EXACT
    * integer arithmetic — the sequential mean-shift detector monitoring
    * pipelines run per key, here WITHOUT its sequential recursion:
    *
    *   s⁺_i = max(0, s⁺_{i−1} + (x_i − target − slack))
    *
    * has the closed form  s⁺_i = P_i − min(0, min_{j≤i} P_j)  over the
    * prefix sums P of the drift-corrected deltas (induction: a new prefix
    * minimum is exactly the step where the recursion clamps to 0), and
    * symmetrically  s⁻_i = max(0, max_{j≤i} E_j) − E_i  for the downward
    * side. So the whole detector is TWO cumulative window functions per
    * side — one key exchange, frame state O(1) — instead of a per-key
    * sequential fold, and every value is an exact long over cent-quantized
    * inputs (`floor(v·100)`), reproducible across engines and layouts.
    *
    * Output adds: cusum_pos / cusum_neg (the detector statistics, cents)
    * and shift_up / shift_down (statistic > hCents). All parameters in
    * cents. Prefix sums are per-key sums of |x−target|±slack-sized longs —
    * overflow needs ~10¹⁴ same-key events at |Δ| ≤ 10⁵ cents.
    */
  def cusum(df: DataFrame, keyCol: String, tsCol: String, ordCol: String,
      valueCol: String, targetCents: Long, slackCents: Long,
      hCents: Long): DataFrame = {
    require(slackCents >= 0, s"slackCents must be non-negative, got $slackCents")
    require(hCents > 0, s"hCents must be positive, got $hCents")
    val order = Window.partitionBy(keyCol).orderBy(col(tsCol), col(ordCol))
    val cum = order.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("__xq", floor(col(valueCol) * lit(100)).cast("long"))
      .withColumn("__p", sum(col("__xq") - lit(targetCents + slackCents)).over(cum))
      .withColumn("__e", sum(col("__xq") - lit(targetCents - slackCents)).over(cum))
      .withColumn("cusum_pos", col("__p") - least(min(col("__p")).over(cum), lit(0L)))
      .withColumn("cusum_neg", greatest(max(col("__e")).over(cum), lit(0L)) - col("__e"))
      .withColumn("shift_up", col("cusum_pos") > hCents)
      .withColumn("shift_down", col("cusum_neg") > hCents)
      .drop("__xq", "__p", "__e")
  }

  /** Width-bounded exponentially-weighted moving average in ENGINE-EXACT
    * integer arithmetic. The classic EWMA recursion
    * `s_t = α·x_t + (1−α)·s_{t−1}` truncated to its last `width` terms is a
    * weighted mean with geometric weights (1−α)^lag — the constant α factor
    * cancels under normalization. With decay 1−α = decayNum/decayDen
    * rational, scaling every weight by decayDen^(width−1) makes them exact
    * longs:  w(lag) = decayNum^lag · decayDen^(width−1−lag),  newest
    * heaviest. Values are cent-quantized (`floor(v·100)`), the weight table
    * is a plan-time literal array (width is a constant), and the output is
    * `Σ w·x div Σ w` — truncating integer division, identical on both
    * engines — so the oracle matches bit-for-bit where float pow/avg would
    * drift in the last ulp.
    *
    * At the head of a series (fewer than `width` predecessors) the SAME
    * weight-by-lag table applies to the rows present — the truncated-EWMA
    * convention — and normalization keeps it exact.
    *
    * Input contract: ONE row per (key, bucket) — i.e. an already-regular
    * series such as [[resampleFill]] output. Duplicate buckets make the
    * frame order (hence the fold) depend on physical row order.
    *
    * Scale shape: one exchange on `keyCol`; the window frame collects
    * `width` (bucket, cents) structs per row — O(width) state, a knob. The
    * in-frame sort makes the fold order deterministic regardless of
    * partition layout. Overflow guard: decayDen^(width−1) must stay under
    * 2^31 so Σ w·x fits a long at |cents| ≤ 10⁷.
    */
  def ewma(df: DataFrame, keyCol: String, bucketCol: String, valCol: String,
      width: Int, decayNum: Int, decayDen: Int): DataFrame = {
    require(width > 0 && width <= 64, s"width must be in [1,64], got $width")
    require(decayNum > 0 && decayDen > decayNum,
      s"decay must be a rational in (0,1), got $decayNum/$decayDen")
    require(BigInt(decayDen).pow(width - 1) < (BigInt(1) << 31),
      s"decayDen^(width-1) = ${BigInt(decayDen).pow(width - 1)} overflows the " +
        "long weight budget — shrink width or the denominator")
    val weights = (0 until width)
      .map(l => (BigInt(decayNum).pow(l) * BigInt(decayDen).pow(width - 1 - l)).toLong)
    val wArr = array(weights.map(lit): _*)
    val order = Window.partitionBy(keyCol).orderBy(col(bucketCol))
    val frame = order.rowsBetween(-(width - 1), Window.currentRow)
    val win = col("__win")
    val L = size(win)
    // element idx (0-based, bucket-ascending) has lag L-1-idx → weight
    // table position L-idx (1-based); num and den use the same subset so
    // the decayDen^(width-1) scale cancels in the division
    val num = aggregate(sequence(lit(0), L - 1), lit(0L),
      (acc, i) => acc + element_at(wArr, L - i) * element_at(win, i + 1).getField("x"))
    val den = aggregate(sequence(lit(0), L - 1), lit(0L),
      (acc, i) => acc + element_at(wArr, L - i))
    df.filter(col(valCol).isNotNull)
      .withColumn("__x", floor(col(valCol) * lit(100)).cast("long"))
      .withColumn("__win", sort_array(
        collect_list(struct(col(bucketCol).as("b"), col("__x").as("x"))).over(frame)))
      .withColumn("__num", num)
      .withColumn("__den", den)
      .withColumn("ewma_cents", expr("__num div __den"))
      .drop("__x", "__win", "__num", "__den")
  }

  /** Windowed top-N trending items: per time bucket, the N most frequent
    * values of an item column, ties by item ascending — the trending-
    * topics shape. Scale: one map-combined groupBy (bucket, item) — the
    * only data-sized stage — then a per-bucket row_number whose partition
    * is the bucket's DISTINCT-ITEM table (bounded by the item domain, not
    * the event count). `tsCol` is epoch-micros.
    */
  def trendingTopN(df: DataFrame, tsCol: String, itemCol: Column,
      stepUs: Long, n: Int): DataFrame = {
    require(stepUs > 0 && n > 0, s"bad stepUs=$stepUs n=$n")
    val w = Window.partitionBy("bucket").orderBy(col("cnt").desc, col("item").asc)
    df.select(expr(s"`$tsCol` div ${stepUs}L").as("bucket"), itemCol.as("item"))
      .filter(col("item").isNotNull)
      .groupBy("bucket", "item").agg(count(lit(1)).as("cnt"))
      .withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= n)
  }

  /** Gap-based sessionization: a new session starts when the time since the
    * key's previous event exceeds `gapUs`. Returns every event with its
    * 0-based per-key `session_id` (cumulative sum of session-break flags —
    * one lag + one running sum, both in a key-partitioned window).
    */
  def sessionize(df: DataFrame, keyCol: String, tsCol: String, ordCol: String,
      gapUs: Long): DataFrame = {
    require(gapUs > 0, s"gapUs must be positive, got $gapUs")
    val order = Window.partitionBy(keyCol).orderBy(col(tsCol), col(ordCol))
    val runningSum = order.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("__prev", lag(col(tsCol), 1).over(order))
      .withColumn("__brk",
        when(col("__prev").isNull || col(tsCol) - col("__prev") > gapUs, 1L)
          .otherwise(0L))
      .withColumn("session_id", sum(col("__brk")).over(runningSum) - 1)
      .drop("__prev", "__brk")
  }
}
