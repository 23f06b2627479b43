package graft.tools

import java.sql.Timestamp
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.streaming.StreamJoins

/** Scratch driver (dev tool): runs the windowed stream-stream join as a real
  * StreamingQuery over the reference's 15-step script and prints per-step
  * emissions.
  */
object JoinDemo {
  case class Ev(key: Long, value: String, ts: Timestamp)

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    implicit val ctx = spark.sqlContext

    val base = 1700000000000L
    val script = Seq(
      ('L', null, 1), ('R', null, 2), ('L', "A", 3), ('R', "a", 4), ('L', "B", 5),
      ('R', "b", 6), ('L', null, 7), ('R', null, 8), ('L', "C", 9), ('R', "c", 10),
      ('R', null, 11), ('L', null, 12), ('R', null, 13), ('R', "d", 14), ('L', "D", 15))

    val left = MemoryStream[Ev]; val right = MemoryStream[Ev]
    val out = StreamJoins.windowed(
      left.toDF().filter(col("value").isNotNull),
      right.toDF().filter(col("value").isNotNull),
      "key", "ts", 10000, "inner")
      .select(StreamJoins.dashJoin(col("l_value"), col("r_value")).as("v"))
    val q = out.writeStream.format("memory").queryName("demo")
      .outputMode("append").start()
    var seen = Set.empty[String]
    script.foreach { case (side, v, step) =>
      val e = Ev(0L, v.asInstanceOf[String], new Timestamp(base + step))
      if (side == 'L') left.addData(e) else right.addData(e)
      q.processAllAvailable()
      val now = spark.table("demo").as[String].collect().toSet
      println(s"step $step ${side}:${Option(v).getOrElse("null")} -> emitted ${(now -- seen).toSeq.sorted.mkString("[", ",", "]")}")
      seen = now
    }
    q.stop()
    println(s"TOTAL ${seen.size} results")
    out.explain("formatted")
    spark.stop()
  }
}
