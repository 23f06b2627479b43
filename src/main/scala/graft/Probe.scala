package graft
import org.apache.spark.sql.SparkSession

/** Throwaway environment probe (not part of the library surface). */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try {
      val ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
      ev.printSchema()
      ev.show(3, false)
    } catch {
      case e: Throwable => println(s"PLAIN READ FAILED: ${e.getClass.getName}: ${e.getMessage.take(300)}")
    }
    try {
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
      ev.printSchema()
      ev.show(3, false)
    } catch {
      case e: Throwable => println(s"NANOS-AS-LONG READ FAILED: ${e.getClass.getName}: ${e.getMessage.take(300)}")
    }
    spark.stop()
  }
}
