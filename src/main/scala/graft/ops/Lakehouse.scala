package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Incremental corpus maintenance over plain parquet: the three write
  * strategies a continuously-updated 100 TB corpus needs, with the same
  * merge semantics the reference materializes through compacted-topic
  * upserts (a KTable is exactly "latest record per key wins, null value
  * deletes" — reference `ConnectSourceConsumer.java` offset/key model).
  *
  *  - COPY-ON-WRITE ([[upsertSharded]]): the table is directory-
  *    partitioned into `shard = pmod(murmur3(key), n)`. An upsert batch
  *    routes its rows to shards, merges ONLY the touched shards, and
  *    atomically replaces just those directories (dynamic partition
  *    overwrite) — untouched shard files are never read or rewritten.
  *    Read amplification zero, write amplification = touched fraction.
  *  - MERGE-ON-READ ([[morView]]): deltas are appended as-is (cheapest
  *    possible write) and readers reconcile: latest version per key wins,
  *    tombstones drop the key. Write amplification zero; the read pays
  *    one shuffle on the key.
  *  - COMPACTION ([[compactTo]]): fold the reconciled view back into a
  *    fresh sharded base — after which MOR and COW answer identically
  *    (the `lake_compact_equiv` oracle pins the equivalence).
  *
  * Scale notes:
  *  - shard count is the COW rewrite granularity: at 100 TB with ~256 MB
  *    target files, n ≈ 400k shards; a batch touching k distinct shards
  *    rewrites k/n of the table. Uniformly-hashed keys touch ~all shards
  *    once the batch exceeds ~n·ln(n) keys — COW wins for small/clustered
  *    batches (takedown lists, per-source re-crawls), MOR+periodic
  *    compaction wins for firehose updates. Both are provided because the
  *    crossover is workload-owned, not engine-owned.
  *  - the shard function is the SAME murmur3-pmod Spark's bucketing and
  *    `repartition(n, key)` use, so a sharded table can be promoted to a
  *    join-aligned bucketed layout (ops/Bucketing) without moving rows
  *    across shard boundaries.
  *  - the merge itself is a full-outer join restricted to touched shards:
  *    both sides are pre-filtered by the shard predicate, so at scale it
  *    shuffles only the touched fraction, never the table.
  */
object Lakehouse {

  val ShardCol = "_shard"

  /** The bucketing-compatible shard id: pmod(murmur3(key), shards). */
  def shardOf(key: String, shards: Int) =
    pmod(hash(col(key)), lit(shards))

  /** Initial sharded layout write (skipped if the path already exists —
    * the layout is a one-time investment the incremental writes amortize).
    */
  def writeShardedOnce(df: DataFrame, path: String, key: String,
      shards: Int): Unit = synchronized {
    val done = new java.io.File(path, "_SUCCESS")
    if (!done.isFile) {
      val sharded = df.withColumn(ShardCol, shardOf(key, shards))
      sharded.write.partitionBy(ShardCol).mode("overwrite").parquet(path)
      writeSchemaSidecar(path, sharded)
    }
  }

  /** An EMPTY partitioned write leaves no data files and no partition
    * directories — nothing to infer a schema from — so the writers leave
    * the schema DDL in a sidecar (underscore-prefixed: invisible to
    * Spark's file listing) and reads fall back to it. A zero-row corpus
    * is a legitimate state for an incrementally-maintained table (day
    * zero, or everything tombstoned).
    */
  private val SchemaSidecar = "_graft_schema.ddl"

  private def writeSchemaSidecar(path: String, df: DataFrame): Unit =
    java.nio.file.Files.write(
      java.nio.file.Paths.get(path, SchemaSidecar),
      df.schema.toDDL.getBytes("UTF-8"))

  /** Schema-on-read: when the sidecar exists it is authoritative — after
    * a schema-evolving upsert only the touched shards' files carry the
    * new column, and footer inference would resolve the table schema
    * from whichever file it samples; the explicit schema makes every
    * file read consistently (parquet fills absent columns with null).
    */
  private def readWithFallback(spark: SparkSession, path: String): DataFrame = {
    val sidecar = java.nio.file.Paths.get(path, SchemaSidecar)
    if (java.nio.file.Files.isRegularFile(sidecar)) {
      val ddl = new String(java.nio.file.Files.readAllBytes(sidecar), "UTF-8")
      spark.read.schema(ddl).parquet(path)
    } else spark.read.parquet(path)
  }

  /** All current rows (shard column dropped — it's layout, not data). */
  def readSharded(spark: SparkSession, path: String): DataFrame =
    readWithFallback(spark, path).drop(ShardCol)

  /** Copy-on-write upsert: `updates` rows replace same-key base rows,
    * new keys insert, rows with `deletedCol = true` remove the key.
    * Only shards receiving at least one update row are read, merged, and
    * rewritten (dynamic partition overwrite swaps exactly those
    * directories); every other shard's files are untouched.
    *
    * If one batch carries several rows for a key, the highest
    * `versionCol` wins and a tombstone beats an update at the same
    * version (same reconciliation as [[morView]], so COW and MOR agree
    * row-for-row on identical inputs).
    *
    * SCHEMA EVOLUTION: a column present on only one side widens the
    * table schema — base rows read null for batch-new columns, updated
    * rows carry null for columns the batch dropped (full-row-replacement
    * semantics). The evolved schema lands in the sidecar after the swap,
    * and reads are schema-on-read against it, so untouched shards (whose
    * files predate the new column) stay consistent.
    *
    * Returns the touched shard ids (the write amplification, in shards).
    */
  def upsertSharded(spark: SparkSession, path: String, key: String,
      shards: Int, updates: DataFrame, versionCol: String,
      deletedCol: String): Seq[Int] = {
    val upd = updates.withColumn(ShardCol, shardOf(key, shards))
    val touched = upd.select(ShardCol).distinct()
      .collect().map(_.getInt(0)).toSeq.sorted
    if (touched.isEmpty) return touched

    val base = readWithFallback(spark, path)
      .filter(col(ShardCol).isin(touched.map(Integer.valueOf): _*))
      .withColumn(versionCol, lit(Long.MinValue))
      .withColumn(deletedCol, lit(false))
    val all = base.unionByName(upd, allowMissingColumns = true)
    val dataCols = all.columns
      .filter(c => c != versionCol && c != deletedCol && c != ShardCol)
    val merged = reconcile(all, key, versionCol, deletedCol)
      .select(ShardCol, dataCols: _*)

    // stage the merged shards, then swap: the overwrite must not read the
    // directories it replaces (Spark rejects overwriting an input path,
    // and a mid-write failure would otherwise corrupt the base). The
    // staging write is the actual copy-on-write — new files first, the
    // atomic swap after.
    val staging = path.stripSuffix("/") + "_staging"
    merged.write.mode("overwrite").parquet(staging)
    // the staging schema is known a priori — an all-tombstone merge
    // leaving zero rows must still be readable for the swap
    val stagingDf = spark.read.schema(merged.schema).parquet(staging)
    stagingDf.write.partitionBy(ShardCol)
      .option("partitionOverwriteMode", "dynamic")
      .mode("overwrite").parquet(path)
    // dynamic partition overwrite only replaces partitions it WRITES rows
    // for: a touched shard whose every key was tombstoned has zero staged
    // rows, so its old directory would survive the swap and the deletes
    // would silently un-apply on read. Remove those directories explicitly.
    // (A crash between the swap and these deletes re-exposes the stale
    // shards; `_staging` holds the merged state for recovery/retry — the
    // upsert is idempotent, re-running it converges.)
    val stagedShards = stagingDf.select(ShardCol).distinct()
      .collect().map(_.getInt(0)).toSet
    val emptied = touched.filterNot(stagedShards)
    if (emptied.nonEmpty) {
      val fs = new org.apache.hadoop.fs.Path(path)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      emptied.foreach { sh =>
        fs.delete(new org.apache.hadoop.fs.Path(path, s"$ShardCol=$sh"), true)
      }
    }
    // sidecar last: a crash between swap and sidecar leaves reads on the
    // pre-evolution schema (new column invisible) until the next write —
    // stale but consistent, never mixed-per-file
    writeSchemaSidecar(path, stagingDf)
    touched
  }

  /** Merge-on-read view: base ∪ deltas reconciled — per key the highest
    * `versionCol` wins (base rows rank below every delta), keys whose
    * winning row has `deletedCol = true` disappear. One hash shuffle on
    * the key; nothing is rewritten.
    */
  def morView(base: DataFrame, deltas: DataFrame, key: String,
      versionCol: String, deletedCol: String): DataFrame = {
    val b = base
      .withColumn(versionCol, lit(Long.MinValue))
      .withColumn(deletedCol, lit(false))
    reconcile(b.unionByName(deltas.select(b.columns.map(col).toSeq: _*)),
      key, versionCol, deletedCol)
      .drop(versionCol, deletedCol)
  }

  /** Time travel: the table as of `version` — [[morView]] with only the
    * deltas at or below the version applied. Because deltas are
    * append-only and versioned, every historical state stays
    * reconstructable, which is what makes a training run reproducible
    * ("trained on corpus@v12") long after later upserts landed. O(base +
    * deltas≤v) read, nothing rewritten.
    */
  def asOf(base: DataFrame, deltas: DataFrame, key: String,
      versionCol: String, deletedCol: String, version: Long): DataFrame =
    morView(base, deltas.filter(col(versionCol) <= version),
      key, versionCol, deletedCol)

  /** Fold a reconciled view into a fresh sharded base at `path` —
    * compaction. After this, [[readSharded]] ≡ the pre-compaction
    * [[morView]].
    */
  def compactTo(view: DataFrame, path: String, key: String,
      shards: Int): Unit = {
    val sharded = view.withColumn(ShardCol, shardOf(key, shards))
    sharded.write.partitionBy(ShardCol).mode("overwrite").parquet(path)
    writeSchemaSidecar(path, sharded)
  }

  /** Latest-per-key: highest version wins; a tombstone beats an update at
    * the SAME version; a later-version update resurrects a deleted key.
    */
  private def reconcile(all: DataFrame, key: String, versionCol: String,
      deletedCol: String): DataFrame = {
    val w = Window.partitionBy(col(key))
      .orderBy(col(versionCol).desc, col(deletedCol).desc)
    all.withColumn("_rk", row_number().over(w))
      .filter(col("_rk") === 1 && !col(deletedCol))
      .drop("_rk")
  }
}
