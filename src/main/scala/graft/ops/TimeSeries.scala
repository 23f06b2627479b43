package graft.ops

import org.apache.spark.sql.DataFrame
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
