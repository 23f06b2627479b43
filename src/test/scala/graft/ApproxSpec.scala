package graft

import org.apache.spark.sql.functions._

/** Approximate aggregates — the sketches a 100 TB engine reaches for when
  * exact answers don't pay their way: HLL++ distinct counts (mergeable,
  * constant memory) and the approx_percentile sketch. Specs pin the error
  * envelope and the partition-invariance (mergeability) that make them
  * safe to use, since no DuckDB oracle can check approximate output.
  */
class ApproxSpec extends SparkSpec {
  import spark.implicits._

  test("approx_count_distinct lands within rsd of truth and merges across partitions") {
    val n = 50000
    val df = spark.range(n).select((col("id") % 9973).as("v")) // 9973 distinct
    val approx = df.select(approx_count_distinct(col("v"), rsd = 0.02))
      .as[Long].head()
    assert(math.abs(approx - 9973).toDouble / 9973 < 0.06,
      s"approx=$approx vs exact=9973")
    // mergeability: the estimate is layout-independent (same sketch merged
    // from 2 or 16 partitions)
    val a2 = df.repartition(2).select(approx_count_distinct(col("v"), rsd = 0.02)).as[Long].head()
    val a16 = df.repartition(16).select(approx_count_distinct(col("v"), rsd = 0.02)).as[Long].head()
    assert(a2 === a16, "HLL merge must be partition-layout independent")
  }

  test("HLL sketches persist, merge incrementally, and estimate within rse") {
    import org.apache.spark.sql.functions._
    // two "days" with overlapping users: 1..3000 and 2001..5000
    val d1 = (1L to 3000L).map(u => ("d1", u)).toDF("day", "user")
    val d2 = (2001L to 5000L).map(u => ("d2", u)).toDF("day", "user")
    val dir = java.nio.file.Files.createTempDirectory("graft_hll").toString
    // build per-day sketches and PERSIST them — the raw data is now gone
    graft.ops.Sketches.distinctSketches(d1.union(d2), Seq("day"), "user")
      .write.mode("overwrite").parquet(dir)
    val stored = spark.read.parquet(dir)
    // per-day estimates
    val perDay = graft.ops.Sketches.rollupEstimate(stored, Seq("day"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(math.abs(perDay("d1") - 3000L) <= 150, s"$perDay")
    assert(math.abs(perDay("d2") - 3000L) <= 150, s"$perDay")
    // cross-day union answers the overlap question WITHOUT the raw data:
    // true distinct = 5000 (not 6000 — 1000 users overlap)
    val global = graft.ops.Sketches.rollupEstimate(stored, Seq.empty)
      .collect().head.getLong(0)
    assert(math.abs(global - 5000L) <= 250, s"global $global")
    // incremental: sketching a NEW day and unioning with stored sketches
    // equals sketching everything from scratch (merge associativity)
    val d3 = (4500L to 6000L).map(u => ("d3", u)).toDF("day", "user")
    val inc = graft.ops.Sketches.rollupEstimate(
      stored.unionByName(
        graft.ops.Sketches.distinctSketches(d3, Seq("day"), "user")), Seq.empty)
      .collect().head.getLong(0)
    val scratch = graft.ops.Sketches.rollupEstimate(
      graft.ops.Sketches.distinctSketches(
        d1.union(d2).union(d3), Seq("day"), "user"), Seq.empty)
      .collect().head.getLong(0)
    assert(inc === scratch, s"incremental $inc vs scratch $scratch")
  }

  test("approx_percentile tracks the exact quantiles within accuracy bounds") {
    val df = spark.range(100000).select(col("id").cast("double").as("v"))
    val Seq(p50, p99) = df
      .select(percentile_approx(col("v"), array(lit(0.5), lit(0.99)), lit(10000)))
      .as[Seq[Double]].head().toSeq
    assert(math.abs(p50 - 50000) < 1000, s"p50=$p50")
    assert(math.abs(p99 - 99000) < 1000, s"p99=$p99")
  }
}
