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

  /** Underscore-prefixed so Spark's parquet listing ignores it. */
  private val BatchMarker = "_graft_batchid"

  /** Snapshot diff: classify every key across two dataset versions as
    * added / removed / changed / unchanged -- the audit step between
    * pipeline runs (and the input to an incremental downstream refresh:
    * process only added + changed). One full-outer equi-join on the key;
    * change detection is a null-safe struct comparison over the non-key
    * columns (order-normalized) -- exact, no hash collisions, and null vs
    * empty-string can't fake equality the way concatenated hashing would.
    *
    * Scale: one keyed join, AQE free to pick the strategy; the struct
    * compare is a per-row codegen'd predicate.
    */
  def snapshotDiff(oldDf: DataFrame, newDf: DataFrame, keyCol: String): DataFrame = {
    import org.apache.spark.sql.functions._
    val valueCols = oldDf.columns.filter(_ != keyCol).sorted
    require(valueCols.sameElements(newDf.columns.filter(_ != keyCol).sorted),
      s"snapshot schemas differ: ${oldDf.columns.toSeq} vs ${newDf.columns.toSeq}")
    val o = oldDf.select(col(keyCol),
      struct(valueCols.toIndexedSeq.map(col): _*).as("__v_old"), lit(true).as("__p_old"))
    val n = newDf.select(col(keyCol),
      struct(valueCols.toIndexedSeq.map(col): _*).as("__v_new"), lit(true).as("__p_new"))
    o.join(n, Seq(keyCol), "full_outer")
      .select(col(keyCol),
        when(col("__p_old").isNull, "added")
          .when(col("__p_new").isNull, "removed")
          .when(col("__v_old") <=> col("__v_new"), "unchanged")
          .otherwise("changed").as("change"))
  }

  /** [[snapshotDiff]] keeping the row images: per changed key, the full
    * old and new value structs ride along — the input shape incremental
    * view maintenance needs (to retract the old contribution and add the
    * new one). Same single full-outer equi-join.
    */
  def snapshotDiffImages(oldDf: DataFrame, newDf: DataFrame,
      keyCol: String): DataFrame = {
    import org.apache.spark.sql.functions._
    val valueCols = oldDf.columns.filter(_ != keyCol).sorted
    require(valueCols.sameElements(newDf.columns.filter(_ != keyCol).sorted),
      s"snapshot schemas differ: ${oldDf.columns.toSeq} vs ${newDf.columns.toSeq}")
    val o = oldDf.select(col(keyCol),
      struct(valueCols.toIndexedSeq.map(col): _*).as("__old"))
    val n = newDf.select(col(keyCol),
      struct(valueCols.toIndexedSeq.map(col): _*).as("__new"))
    o.join(n, Seq(keyCol), "full_outer")
      .select(col(keyCol),
        when(col("__old").isNull, "added")
          .when(col("__new").isNull, "removed")
          .when(col("__old") <=> col("__new"), "unchanged")
          .otherwise("changed").as("change"),
        col("__old"), col("__new"))
  }

  /** Incremental view maintenance for additive group stats: refresh a
    * persisted `(group, n, s)` aggregate from a change feed WITHOUT
    * rescanning the base table. Every removed/changed old image retracts
    * `(-1, -value)` from its old group, every added/changed new image
    * adds `(+1, +value)` to its new group (a change may MOVE a row
    * between groups — both sides are handled), and groups whose count
    * reaches zero disappear, matching a from-scratch re-aggregation
    * exactly for these distributive aggregates.
    *
    * Scale: O(|changes| + |groups|) — the maintained aggregate never
    * re-reads the 100 TB it summarizes. `unchanged` rows should be
    * filtered out upstream (they contribute nothing; passing them is
    * harmless but pays join width). Exactness requires an exact-additive
    * value type (long / decimal) — float sums would drift under
    * retraction.
    */
  def refreshGroupStats(stats: DataFrame, diffImages: DataFrame,
      groupField: String, valueField: String,
      groupCol: String = "g", nCol: String = "n",
      sumCol: String = "s"): DataFrame = {
    import org.apache.spark.sql.functions._
    val retract = diffImages.filter(col("change").isin("removed", "changed"))
      .select(col("__old")(groupField).as(groupCol),
        lit(-1L).as(nCol), (-col("__old")(valueField)).as(sumCol))
    val add = diffImages.filter(col("change").isin("added", "changed"))
      .select(col("__new")(groupField).as(groupCol),
        lit(1L).as(nCol), col("__new")(valueField).as(sumCol))
    stats.select(col(groupCol), col(nCol).cast("long"), col(sumCol))
      .unionByName(retract).unionByName(add)
      .groupBy(groupCol)
      .agg(sum(nCol).as(nCol), sum(sumCol).as(sumCol))
      .filter(col(nCol) > 0)
  }

  /** Persisted [[refreshGroupStats]]: read the stats table at `statsPath`
    * (initialize empty on first touch), refresh from the feed, publish by
    * RENAME swap — stage the new table, retire the old directory, rename
    * the staging in (each rename atomic on HDFS/local). A crash between
    * the renames leaves no live table but complete `_old` (pre-batch) and
    * `_staging` (post-batch) copies; the next refresh recovers the
    * PRE-batch `_old` when present — so a caller retrying the same diff
    * (the only way a crashed call's feed gets applied) applies it exactly
    * once — falling back to `_staging` only when `_old` is absent.
    *
    * Replay idempotence across ALL crash windows (including a crash AFTER
    * publish but before the stream checkpoint commits, where the live
    * table already contains the batch) needs more than rename order: pass
    * `batchId` and the id is recorded inside the published table; a
    * refresh whose `batchId` equals the live table's recorded id is a
    * replay and becomes a no-op. foreachBatch drivers MUST pass their
    * batch id (CdcStreamSpec does); without it, replay-exactness only
    * covers the between-renames window via the `_old` preference.
    * The replay window is ONE BATCH DEEP — exactly foreachBatch's
    * contract (Structured Streaming re-delivers at most the single last
    * uncommitted batch): only the most recent batch id is recorded, so a
    * driver replaying SEVERAL uncommitted batches (a custom runner with a
    * deeper redo log) would double-apply all but the newest. Such a
    * driver must de-duplicate upstream or track its own high-water mark.
    * The stats table is O(groups) — tiny by construction — so
    * the full rewrite is the cheap part; the point is what is NOT read:
    * the base table the stats summarize. Drive from `foreachBatch` and a
    * changelog stream maintains a live aggregate at
    * O(|batch| + |groups|) per micro-batch (CdcStreamSpec).
    */
  def refreshGroupStatsAt(spark: org.apache.spark.sql.SparkSession,
      statsPath: String, diffImages: DataFrame, groupField: String,
      valueField: String, batchId: Option[Long] = None): Unit = {
    import org.apache.spark.sql.functions._
    val conf = spark.sparkContext.hadoopConfiguration
    val target = new org.apache.hadoop.fs.Path(statsPath)
    val fs = target.getFileSystem(conf)
    val staging = new org.apache.hadoop.fs.Path(
      statsPath.stripSuffix("/") + "_staging")
    val retired = new org.apache.hadoop.fs.Path(
      statsPath.stripSuffix("/") + "_old")
    def complete(p: org.apache.hadoop.fs.Path): Boolean =
      fs.isFile(new org.apache.hadoop.fs.Path(p, "_SUCCESS"))
    def recordedBatch(p: org.apache.hadoop.fs.Path): Option[Long] = {
      val m = new org.apache.hadoop.fs.Path(p, BatchMarker)
      if (!fs.isFile(m)) None
      else {
        val buf = new Array[Byte](fs.getFileStatus(m).getLen.toInt)
        val in = fs.open(m)
        try in.readFully(0, buf) finally in.close()
        Some(new String(buf, java.nio.charset.StandardCharsets.UTF_8).trim.toLong)
      }
    }
    val gType = diffImages.schema("__new").dataType
      .asInstanceOf[org.apache.spark.sql.types.StructType](groupField).dataType
    val vType = diffImages.schema("__new").dataType
      .asInstanceOf[org.apache.spark.sql.types.StructType](valueField).dataType
    // crash healing FIRST: no live table means the previous refresh died
    // between its swap renames. Two recoverable copies can exist — `_old`
    // holds the PRE-batch table (retired just before the crash), `_staging`
    // the POST-batch one. Prefer `_old`: the crashed call never returned,
    // so its feed WILL be retried, and retrying against the pre-batch base
    // applies it exactly once; recovering `_staging` would have the retry
    // double-apply (retract/add arithmetic is not self-idempotent). Fall
    // back to `_staging` only when `_old` is absent (crash in the very
    // first refresh, or `_old` already dropped) — there the `batchId`
    // marker below is what makes the replay a no-op.
    if (!complete(target)) {
      if (complete(retired)) {
        fs.delete(staging, true) // stale post-batch copy of the retried feed
        if (!fs.rename(retired, target))
          throw new java.io.IOException(
            s"could not recover retired stats $retired -> $target")
      } else if (complete(staging)) {
        if (!fs.rename(staging, target))
          throw new java.io.IOException(
            s"could not recover staged stats $staging -> $target")
      }
    }
    // replay detection: the live table already records this batch id — the
    // previous attempt published but crashed before the caller/checkpoint
    // committed. Applying again would double-count; skip.
    if (batchId.isDefined && complete(target) &&
        recordedBatch(target) == batchId) return
    val stats0 =
      if (complete(target)) spark.read.parquet(statsPath)
      else
        spark.createDataFrame(new java.util.ArrayList[org.apache.spark.sql.Row](),
          org.apache.spark.sql.types.StructType(Seq(
            org.apache.spark.sql.types.StructField("g", gType),
            org.apache.spark.sql.types.StructField("n",
              org.apache.spark.sql.types.LongType),
            org.apache.spark.sql.types.StructField("s", vType))))
    // the staging write fully evaluates `refreshed` (reading the live
    // table while it still exists) BEFORE any rename moves its input
    val refreshed = refreshGroupStats(stats0, diffImages, groupField, valueField)
    fs.delete(staging, true)
    refreshed.write.mode("overwrite").parquet(staging.toString)
    // the batch id travels INSIDE the staged dir so the swap publishes the
    // table and its replay marker in the same atomic rename
    batchId.foreach { id =>
      val out = fs.create(new org.apache.hadoop.fs.Path(staging, BatchMarker), true)
      try out.write(id.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      finally out.close()
    }
    // swap via renames (atomic on HDFS/local), NOT delete-then-rewrite: the
    // exposure window is between two metadata ops, not a parquet job. A
    // crash between them leaves no live table but a COMPLETE staging copy,
    // which the loader above recovers from on the next refresh.
    fs.delete(retired, true)
    if (fs.exists(target)) {
      if (!fs.rename(target, retired))
        throw new java.io.IOException(s"could not retire $target")
    }
    if (!fs.rename(staging, target))
      throw new java.io.IOException(s"could not publish $staging -> $target")
    fs.delete(retired, true)
  }

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
