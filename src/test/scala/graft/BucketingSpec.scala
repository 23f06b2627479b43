package graft

import org.apache.spark.sql.execution.ExplainMode
import org.apache.spark.sql.functions._

import graft.ops.Bucketing

/** Pins the bucketed layout's two planner guarantees (ops/Bucketing):
  * zero-exchange co-located joins and planning-time bucket pruning —
  * plus value equality against the unbucketed computation.
  */
class BucketingSpec extends SparkSpec {

  private def formatted(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.explainString(ExplainMode.fromString("formatted"))

  private def hashExchanges(p: String): Int =
    p.linesIterator.count(_.trim.startsWith("Arguments: hashpartitioning("))

  private lazy val dir = sf()
  // spec-owned table names: a bucketed table's NAME owns its schema (the
  // first ensureBucketed wins), so sharing the query surface's names with
  // a different projection would collide
  private lazy val ordTbl = {
    val n = Bucketing.tableName("orders_spec", dir)
    Bucketing.ensureBucketed(spark, n, 8, "o_orderkey")(
      Tables.orders(spark, dir).select("o_orderkey", "o_orderpriority"))
    n
  }
  private lazy val liTbl = {
    val n = Bucketing.tableName("lineitem_spec", dir)
    Bucketing.ensureBucketed(spark, n, 8, "l_orderkey")(
      Tables.lineitem(spark, dir).select("l_orderkey", "l_quantity"))
    n
  }

  test("co-located join on aligned buckets plans ZERO exchanges") {
    val joined = Bucketing.colocatedJoin(spark, ordTbl, liTbl,
      "o_orderkey", "l_orderkey")
    val p = formatted(joined)
    assert(p.contains("SortMergeJoin"), p.take(800))
    assert(hashExchanges(p) === 0,
      s"bucket alignment not recognized — exchanges present:\n${p.take(1500)}")
  }

  test("the same join over raw parquet shuffles both sides (contrast)") {
    val raw = Tables.orders(spark, dir).select("o_orderkey", "o_orderpriority")
      .hint("merge")
      .join(Tables.lineitem(spark, dir).select("l_orderkey", "l_quantity"),
        col("o_orderkey") === col("l_orderkey"))
    assert(hashExchanges(formatted(raw)) === 2)
  }

  test("bucketed join result equals the unbucketed join") {
    val bucketed = Bucketing.colocatedJoin(spark, ordTbl, liTbl,
        "o_orderkey", "l_orderkey")
      .groupBy("o_orderpriority")
      .agg(sum(col("l_quantity").cast("long")).as("q"), count(lit(1)).as("n"))
      .orderBy("o_orderpriority").collect().toSeq
    val plain = Tables.orders(spark, dir)
      .join(Tables.lineitem(spark, dir), col("o_orderkey") === col("l_orderkey"))
      .groupBy("o_orderpriority")
      .agg(sum(col("l_quantity").cast("long")).as("q"), count(lit(1)).as("n"))
      .orderBy("o_orderpriority").collect().toSeq
    assert(bucketed === plain)
  }

  test("point lookup + bucket-key agg prunes buckets at planning time") {
    // the agg on the bucket key is what KEEPS the bucketed access path:
    // see the next test for the bare-scan behavior
    val scan = spark.table(ordTbl).filter(col("o_orderkey").isin(1L, 7L))
      .groupBy("o_orderkey").agg(count(lit(1)).as("n"))
    val p = formatted(scan)
    val sel = p.linesIterator.find(_.contains("SelectedBucketsCount"))
    assert(sel.isDefined, s"no bucket pruning in scan:\n${p.take(1200)}")
    // 2 keys can land in at most 2 of the 8 buckets
    val m = "SelectedBucketsCount: (\\d+) out of (\\d+)".r
      .findFirstMatchIn(sel.get)
    assert(m.isDefined, sel.get)
    assert(m.get.group(2).toInt === 8)
    assert(m.get.group(1).toInt <= 2, sel.get)
    assert(hashExchanges(p) === 0, "bucket-key agg must not shuffle")
  }

  test("a BARE point lookup loses pruning to DisableUnnecessaryBucketedScan " +
      "unless autoBucketedScan is off") {
    val bare = formatted(
      spark.table(ordTbl).filter(col("o_orderkey").isin(1L, 7L)))
    assert(!bare.contains("SelectedBucketsCount"),
      "planner behavior changed: bare scans now keep bucketed access — " +
        "revisit j_bucketed_pruned_scan's agg-shaped workaround")
    val key = "spark.sql.sources.bucketing.autoBucketedScan.enabled"
    val old = spark.conf.get(key)
    try {
      spark.conf.set(key, "false")
      val pinned = formatted(
        spark.table(ordTbl).filter(col("o_orderkey").isin(1L, 7L)))
      assert(pinned.contains("SelectedBucketsCount"), pinned.take(1200))
    } finally spark.conf.set(key, old)
  }

  test("groupBy on the bucket key aggregates without a shuffle") {
    val agg = spark.table(ordTbl).groupBy("o_orderkey")
      .agg(count(lit(1)).as("n"))
    assert(hashExchanges(formatted(agg)) === 0)
  }
}
