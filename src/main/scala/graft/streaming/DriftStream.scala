package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming half of [[graft.ops.Stats.chiSquareDrift]] — the live corpus
  * drift monitor: arriving values are binned by the IDENTICAL fixed-grid
  * projection the batch test uses ([[graft.ops.Stats.gridBin]] is shared,
  * so a boundary disagreement is impossible) and counted by the built-in
  * streaming aggregation. Update-mode output is the running histogram of
  * everything seen so far; scoring a drained (or checkpointed) histogram
  * against the reference snapshot is the tiny |buckets|-row batch step the
  * batch operator already implements.
  *
  * Scale/state story: binning is a stateless per-row projection; the only
  * state is the streaming count — ONE long per occupied bin, hard-bounded
  * by `buckets` (the grid is fixed; outliers clamp to the edge bins), so
  * the monitor's state cannot grow with the stream no matter how long it
  * runs. No watermark is needed: counts are monotone and the grid is
  * closed under clamping.
  *
  * StatsSpec pins stream-drained counts ≡ the batch binning on the same
  * rows, and the composed chi-square score ≡ `chiSquareDrift` end-to-end.
  */
object DriftStream {

  /** (bin, n) running histogram of the stream under the shared grid.
    * Run with OutputMode.Update (or Complete for a full-table sink).
    */
  def binCounts(stream: DataFrame, valueCol: String, loCents: Long,
      widthCents: Long, buckets: Int): DataFrame = {
    require(widthCents > 0, s"widthCents must be positive, got $widthCents")
    require(buckets > 1, s"buckets must exceed 1, got $buckets")
    stream.filter(col(valueCol).isNotNull)
      .select(graft.ops.Stats.gridBin(valueCol, loCents, widthCents, buckets).as("bin"))
      .groupBy("bin")
      .agg(count(lit(1)).as("n"))
  }
}
