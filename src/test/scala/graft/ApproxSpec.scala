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

  test("approx_percentile tracks the exact quantiles within accuracy bounds") {
    val df = spark.range(100000).select(col("id").cast("double").as("v"))
    val Seq(p50, p99) = df
      .select(percentile_approx(col("v"), array(lit(0.5), lit(0.99)), lit(10000)))
      .as[Seq[Double]].head().toSeq
    assert(math.abs(p50 - 50000) < 1000, s"p50=$p50")
    assert(math.abs(p99 - 99000) < 1000, s"p99=$p99")
  }
}
