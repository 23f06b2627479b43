package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Changelog → slowly-changing-dimension (SCD type 2) materialization: turn
  * an append-only per-key change stream (the KTable changelog shape the
  * reference pipes through Connect, e.g. `ConnectKTableImpl`'s
  * topic-backed table) into validity intervals — each version of a key
  * carries `[valid_from, valid_to)` plus an `is_current` flag, the standard
  * warehouse dimension layout.
  *
  * Scale: one window partitioned BY KEY — the shuffle is the same
  * hash-by-key exchange the latest-per-key (A3) materialization needs, per-
  * reducer state is one key's history, and no global ordering exists
  * anywhere. A tie column makes the order total so replayed/duplicated
  * changelogs produce identical intervals (deterministic under retries).
  */
object Cdc {

  /** @param tsCol   event-time column (epoch long or timestamp)
    * @param tieCol  unique-per-key tiebreaker for same-timestamp changes
    *                (offset / event id)
    */
  def scd2(changes: DataFrame, keyCol: String, tsCol: String, tieCol: String): DataFrame = {
    val w = Window.partitionBy(keyCol).orderBy(col(tsCol), col(tieCol))
    changes
      .withColumn("valid_from", col(tsCol))
      .withColumn("valid_to", lead(col(tsCol), 1).over(w))
      .withColumn("is_current", col("valid_to").isNull)
  }
}
