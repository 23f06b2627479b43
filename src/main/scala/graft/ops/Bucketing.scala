package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Hash-bucketed table layout: pay the shuffle ONCE at write time, then
  * join/aggregate on the bucket key with ZERO exchange forever after.
  *
  * This is the missing piece between "broadcast the small side" and
  * "shuffle both sides every query": at 100 TB the fact-fact joins
  * (lineitem ⋈ orders, events ⋈ documents) can't broadcast and
  * re-shuffling hundreds of TB per query dominates every plan. Bucketing
  * both tables by the join key with the SAME bucket count makes their
  * partitionings provably identical (Spark's bucket id is
  * `pmod(murmur3(key), n)` — the same function `repartition(n, key)`
  * uses), so the sort-merge join's `EnsureRequirements` pass finds both
  * children already `HashPartitioning(key, n)` and inserts NO Exchange.
  * Point lookups on the bucket key additionally prune to 1-of-n buckets
  * at planning time (`SelectedBucketsCount` in the scan).
  *
  * The reference has no storage layout layer at all — its joins rely on
  * Kafka co-partitioning by topic key (reference
  * `StreamStreamJoinIntegrationTest.java:100-116`: both inputs written
  * with one partition and the same key). Bucketed tables are the batch
  * analogue of that co-partitioning contract: the key-to-bucket function
  * is persisted in the catalog the way topic partitioning is fixed by the
  * producer, and every downstream consumer inherits the alignment.
  *
  * Scale notes:
  *  - bucket count is a layout-time choice: at 100 TB pick
  *    `tableBytes / ~256 MB` buckets (tens of thousands); here 8 keeps
  *    the sf0.01/0.1 fixtures meaningful (buckets stay non-trivially
  *    populated) while exercising the identical planner path.
  *  - one file per bucket per write (the `repartition(n, key)` below) is
  *    what lets the scan also report sorted output; with many writers a
  *    bucket spans files and Spark re-sorts within the partition — still
  *    zero shuffle, which is the expensive half.
  *  - the write is idempotent per (table, sf-dir): first touch in a
  *    session pays the one-time shuffle+write, every later query reuses
  *    the catalog entry — exactly the amortization the layout exists for.
  */
object Bucketing {

  /** Catalog-safe table name, unique per (base table, source dir) so
    * sf0.01 and sf0.1 fixtures never alias each other's layouts.
    */
  def tableName(base: String, sfDir: String): String = {
    val dir = sfDir.replaceAll("[^A-Za-z0-9]", "_").replaceAll("_+", "_")
    s"graft_bkt_${base}_$dir"
  }

  /** Ensure `name` exists as a path-backed bucketed+sorted parquet table.
    * `build` is only evaluated (and the shuffle+write only paid) when the
    * session catalog doesn't have the table yet. The NAME owns its schema:
    * the first ensureBucketed for a name wins, later calls reuse it as-is
    * — callers wanting a different projection of the same base must use a
    * different name (BucketingSpec hit exactly this).
    */
  def ensureBucketed(spark: SparkSession, name: String, buckets: Int,
      key: String)(build: => DataFrame): Unit = synchronized {
    if (!spark.catalog.tableExists(name)) {
      val path = java.nio.file.Paths
        .get(System.getProperty("java.io.tmpdir"), "graft_bucketed", name)
        .toString
      // one shuffle partition per bucket → exactly one file per bucket,
      // so the scan's per-bucket sort metadata is trusted by the planner
      build.repartition(buckets, col(key))
        .write.format("parquet")
        .bucketBy(buckets, key).sortBy(key)
        .option("path", path)
        .mode("overwrite")
        .saveAsTable(name)
    }
  }

  /** The co-located fact-fact join: both sides read from their bucketed
    * layout, sort-merge joined on the (shared) bucket key with zero
    * exchange. The merge hint keeps the demonstration honest at test SF,
    * where the optimizer would otherwise broadcast one side and hide the
    * alignment being proven.
    */
  def colocatedJoin(spark: SparkSession, left: String, right: String,
      leftKey: String, rightKey: String): DataFrame =
    spark.table(left).hint("merge")
      .join(spark.table(right), col(leftKey) === col(rightKey))
}
