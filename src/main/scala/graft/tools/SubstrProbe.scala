package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.ops.SubstrDedup

/** Ad-hoc timing probe for ExactSubstr variants (not library surface). */
object SubstrProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val d = graft.Tables.documents(spark, dir)
    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"PROBE $label rows=$n t=${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    // warmup scan
    d.count()
    // single-pass variant: count() window over gk instead of agg + semi join
    def winVariant(hashed: Boolean): Long = {
      val w0 = SubstrDedup.windows(d, "text", "doc_id", 20)
      val w = if (hashed) w0.select(col("doc_id"), col("pos"), xxhash64(col("gram")).as("gk")) else w0.withColumnRenamed("gram", "gk")
      val marked = w.withColumn("cnt", count(lit(1)).over(Window.partitionBy("gk")))
        .where(col("cnt") >= 2).select("doc_id", "pos")
      val byDoc = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
      val prevMaxEnd = max(col("pos") + 19).over(byDoc.rowsBetween(Window.unboundedPreceding, -1))
      val starts = when(col("pos") > coalesce(prevMaxEnd, lit(Int.MinValue)) + 1, 1).otherwise(0)
      marked.withColumn("isl", sum(starts).over(byDoc.rowsBetween(Window.unboundedPreceding, 0)))
        .groupBy(col("doc_id"), col("isl"))
        .agg(min(col("pos")).as("span_start"), (max(col("pos")) + 19).as("span_end"))
        .agg(sum(col("span_end")), count(lit(1))).collect()(0).getLong(1)
    }
    time("clean_exact") { SubstrDedup.removeDupSpans(d, "text", "doc_id", 20, hashed = false).agg(sum(length(col("clean_text")))).collect()(0).getLong(0) }
    time("spans_exact") { SubstrDedup.dupSpans(d, "text", "doc_id", 20, hashed = false).agg(sum(col("span_end")), count(lit(1))).collect()(0).getLong(1) }
    time("spans_exact2") { SubstrDedup.dupSpans(d, "text", "doc_id", 20, hashed = false).agg(sum(col("span_end")), count(lit(1))).collect()(0).getLong(1) }
    time("spans_win_exact") { winVariant(false) }
    time("spans_win_exact2") { winVariant(false) }
    time("spans_hashed") { SubstrDedup.dupSpans(d, "text", "doc_id", 20, hashed = true).agg(sum(col("span_end")), count(lit(1))).collect()(0).getLong(1) }
    time("spans_win_hashed") { winVariant(true) }
    spark.stop()
  }
}
