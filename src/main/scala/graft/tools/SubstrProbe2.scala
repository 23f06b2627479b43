package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ops.SubstrDedup

object SubstrProbe2 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (dir <- args) {
      val d = graft.Tables.documents(spark, dir)
      val w = SubstrDedup.windows(d, "text", "doc_id", 20)
      val nw = w.count()
      val dup = w.groupBy("gram").agg(count(lit(1)).as("c")).where(col("c") >= 2)
      val ndupkeys = dup.count()
      val ndupocc = dup.agg(sum("c")).collect()(0).getLong(0)
      val t0 = System.nanoTime()
      val nspans = SubstrDedup.dupSpans(d, "text", "doc_id", 20, hashed = false).count()
      val t1 = System.nanoTime()
      val nspansH = SubstrDedup.dupSpans(d, "text", "doc_id", 20, hashed = true).count()
      val t2 = System.nanoTime()
      println(f"PROBE2 $dir windows=$nw dupkeys=$ndupkeys dupocc=$ndupocc spans=$nspans exact=${(t1-t0)/1e9}%.1f hashed=${(t2-t1)/1e9}%.1f")
    }
    spark.stop()
  }
}
