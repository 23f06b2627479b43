package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Online model monitoring: per-micro-batch calibration counts riding
  * `observe()` on the stateless serving stream — the
  * [[graft.ops.Curation.observedGate]] pattern applied to model quality.
  * Each batch's `StreamingQueryProgress.observedMetrics` carries, per
  * score band, (n, n_pos, sum_score_micro) — exactly the
  * [[graft.ops.Classifier.calibrationBins]] numbers, so drift between
  * live confidence and observed rate is read off the progress stream with
  * ZERO extra jobs, no state, and no second pass over the batch.
  *
  * Bands use the same least/floor banding expression as the batch op
  * (duplicated arithmetic is pinned equal by the spec on shared rows);
  * metric names are `b<i>_n`, `b<i>_pos`, `b<i>_ssum`.
  */
object ModelMonitor {

  /** Attach per-band calibration observation to a scored stream. */
  def observedCalibration(scored: DataFrame, scoreCol: String,
      labelCol: String, bands: Int, name: String): DataFrame = {
    require(bands > 1 && bands <= 32,
      s"bands in (1,32] (3 observe columns each), got $bands")
    val band: Column = least(floor(col(scoreCol) * lit(bands)).cast("long"),
      lit(bands - 1L))
    val s = floor(col(scoreCol) * lit(1000000)).cast("long")
    val y = col(labelCol).cast("int")
    // row admission must match Classifier.calibrationBins exactly: rows
    // with a null score OR null label are EXCLUDED from all three metrics
    // (not just the pos count) — otherwise a batch containing an unlabeled
    // row breaks the documented batch ≡ streaming calibration invariant
    val ok = col(scoreCol).isNotNull && col(labelCol).isNotNull
    val metrics = (0 until bands).flatMap { b =>
      Seq(
        sum(when(ok && band === b, 1L).otherwise(0L)).as(s"b${b}_n"),
        sum(when(ok && band === b && y === 1, 1L).otherwise(0L)).as(s"b${b}_pos"),
        sum(when(ok && band === b, s).otherwise(0L)).as(s"b${b}_ssum"))
    }
    scored.observe(name, metrics.head, metrics.tail: _*)
  }
}
