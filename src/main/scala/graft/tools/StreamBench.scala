package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ops.Text

/** Streaming throughput micro-benchmark (dev tool): rate source → word
  * count (update mode) → noop sink; reports sustained rows/sec from query
  * progress. Context: the reference's tests imply a floor of ~2.6 msg/s
  * end-to-end (26 records / 10 s deadline, `KafkaFlatMapTest.java:141`).
  */
object StreamBench {
  def main(args: Array[String]): Unit = {
    val rate = sys.env.getOrElse("SPARK_GRAFT_RATE", "200000").toInt
    val seconds = sys.env.getOrElse("SPARK_GRAFT_SECONDS", "20").toInt
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val lines = spark.readStream.format("rate")
      .option("rowsPerSecond", rate).option("numPartitions", 8).load()
      .select(concat(
        lit("alpha"), (col("value") % 100).cast("string"), lit(" beta"),
        (col("value") % 971).cast("string"), lit(" gamma the and of to is word"),
        (col("value") % 7919).cast("string")).as("text"))
    val q = Text.wordCount(lines, "text")
      .writeStream.format("noop").outputMode("update").start()
    Thread.sleep(seconds * 1000L)
    val progress = q.recentProgress.filter(_.numInputRows > 0)
    q.stop()
    val rows = progress.map(_.numInputRows).sum
    val procRate = progress.map(_.processedRowsPerSecond).filter(!_.isNaN)
    val avg = if (procRate.nonEmpty) procRate.sum / procRate.length else 0.0
    println(f"""{"metric":"stream_wordcount_rows_per_sec","value":$avg%.0f,"rows":$rows,"batches":${progress.length},"offered_rate":$rate}""")
    spark.stop()
  }
}
