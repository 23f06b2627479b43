package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._

/** Storage-layout scale techniques, proven against the physical plan:
  * partition pruning (a filtered scan touches only the matching partition
  * directories) and bucketed co-located joins (pre-bucketed tables join
  * with NO shuffle exchange). These are the two layout levers a 100 TB
  * deployment leans on hardest; the specs pin that the plans actually use
  * them, not just that the API accepts them.
  */
class LayoutSpec extends SparkSpec {
  import spark.implicits._

  private def explain(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))

  test("partitioned parquet: filters prune at the partition level, not per-row") {
    val dir = Files.createTempDirectory("graft_part").toString
    Seq((1L, "click", 1.0), (2L, "view", 2.0), (3L, "click", 3.0), (4L, "buy", 4.0))
      .toDF("event_id", "event_type", "value")
      .write.mode("overwrite").partitionBy("event_type").parquet(dir)
    val read = spark.read.parquet(dir).filter(col("event_type") === "click")
    val p = explain(read)
    // the predicate must appear as a PARTITION filter (directory pruning),
    // not a data filter evaluated per row post-scan
    // attribute names carry expr ids in formatted plans: event_type#19 = click
    assert(p.contains("PartitionFilters") && p.contains("= click)"), p.take(800))
    assert(read.count() === 2)
    // pruned scan reads only the matching directory's files
    val scanned = read.select(input_file_name()).distinct().as[String].collect()
    assert(scanned.forall(_.contains("event_type=click")), scanned.mkString(", "))
  }

  test("bucketed tables join with no shuffle exchange on either side") {
    val prevBroadcast = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      spark.sql("DROP TABLE IF EXISTS graft_buck_a")
      spark.sql("DROP TABLE IF EXISTS graft_buck_b")
      (1L to 100L).map(i => (i % 10, i)).toDF("k", "a")
        .write.mode("overwrite").bucketBy(4, "k").sortBy("k").saveAsTable("graft_buck_a")
      (1L to 40L).map(i => (i % 10, i * 2)).toDF("k", "b")
        .write.mode("overwrite").bucketBy(4, "k").sortBy("k").saveAsTable("graft_buck_b")
      val j = spark.table("graft_buck_a").join(spark.table("graft_buck_b"), "k")
      val p = explain(j)
      assert(!p.contains("Exchange"),
        s"bucketed join should be co-located, plan has an exchange:\n${p.take(800)}")
      assert(j.count() === 100L * 4) // each of 100 rows matches 4 of the 40
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevBroadcast)
      spark.sql("DROP TABLE IF EXISTS graft_buck_a")
      spark.sql("DROP TABLE IF EXISTS graft_buck_b")
    }
  }
}
