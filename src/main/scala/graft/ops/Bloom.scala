package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.SqlIdent

/** Explicit bloom-pruned joins — the "build a bloom on the small side,
  * drop non-matching big-side rows BEFORE the shuffle" pattern that turns
  * a 100 TB shuffle join with a selective build side into a fraction of
  * the I/O. Spark's own InjectRuntimeFilter plants the same shape, but
  * only under conf-gated heuristics on equi-joins it can see through; this
  * operator makes it a first-class, composable step (prune → anything),
  * the way Trino/Flink expose join filters.
  *
  * The bloom is built by Spark's codegen'd `bloom_filter_agg` (partial
  * aggregation: each partition builds a local sketch, OR-merged at the
  * coordinator — one tiny all-to-one exchange bounded by `numBits/8`
  * bytes, never by build-side row count) and probed via
  * `graft_might_contain` (see [[org.apache.spark.sql.graft.BloomOps]]).
  * The bloom rides a scalar subquery, so the whole prune stays ONE lazy
  * declarative plan — no driver-side collect, AQE still free to re-plan.
  */
object Bloom {

  /** Monotone suffix so concurrent prunes in one session never clobber
    * each other's temp views (deterministic — no Random).
    */
  private val viewSeq = new java.util.concurrent.atomic.AtomicLong(0L)

  /** Register the probe function + per-call temp views for the SQL step. */
  private def prune(big: DataFrame, small: DataFrame, bigKey: String, smallKey: String,
      expectedItems: Long, numBits: Long): DataFrame = {
    SqlIdent.column(bigKey); SqlIdent.column(smallKey)
    require(expectedItems > 0 && numBits > 0, "bloom sizing must be positive")
    val spark = big.sparkSession
    org.apache.spark.sql.graft.BloomOps.register(spark)
    val n = viewSeq.incrementAndGet()
    val probeV = s"graft_bloom_probe_$n"
    val buildV = s"graft_bloom_build_$n"
    big.createOrReplaceTempView(probeV)
    small.createOrReplaceTempView(buildV)
    try spark.sql(
      s"""SELECT p.* FROM $probeV p
         |WHERE graft_might_contain(
         |  (SELECT graft_bloom_agg(xxhash64($smallKey), ${expectedItems}L, ${numBits}L)
         |   FROM $buildV),
         |  xxhash64(p.$bigKey))""".stripMargin)
    finally {
      // analysis is eager, so the returned plan no longer needs the views;
      // dropping them keeps a long-lived session's catalog (and the plans
      // the views pin) from growing with every prune call
      spark.catalog.dropTempView(probeV)
      spark.catalog.dropTempView(buildV)
    }
  }

  /** Exact semi join with a bloom pre-filter: the bloom eliminates (1-fpp)
    * of non-matching big-side rows before the shuffle; the semi join on the
    * survivors restores exactness (false positives can't leak — they just
    * shuffle and then fail the join). Result ≡ plain left-semi join, which
    * is what the oracle asserts.
    */
  def semiJoinPruned(big: DataFrame, small: DataFrame, bigKey: String, smallKey: String,
      expectedItems: Long = 1L << 20, numBits: Long = 1L << 23): DataFrame = {
    val pruned = prune(big, small, bigKey, smallKey, expectedItems, numBits)
    pruned.join(small.select(col(smallKey).as(bigKey)).distinct(), Seq(bigKey), "left_semi")
  }

  /** Inner equi-join with the same bloom pre-filter on the probe side. */
  def innerJoinPruned(big: DataFrame, small: DataFrame, bigKey: String, smallKey: String,
      expectedItems: Long = 1L << 20, numBits: Long = 1L << 23): DataFrame = {
    val pruned = prune(big, small, bigKey, smallKey, expectedItems, numBits)
    pruned.join(small, pruned(bigKey) === small(smallKey))
  }
}
