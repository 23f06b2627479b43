package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ops.Skew

/** Scratch driver (dev tool): runs salted aggregation/join on a skewed
  * frame and prints result parity plus the salt spread of the hot key.
  */
object SkewDemo {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val skewed = (1 to 100000).map { i =>
      (if (i <= 90000) "hot" else s"k${i % 17}", i.toLong, i.toDouble)
    }.toDF("key", "id", "v")
    val direct = skewed.groupBy("key").agg(count(lit(1)).as("cnt"), sum($"v").as("sv"))
      .as[(String, Long, Double)].collect().toSet
    val salted = Skew.saltedAgg(skewed, "key", "id", 8, ("v", "sv"))
      .as[(String, Long, Double)].collect().toSet
    println(s"agg parity: ${direct == salted} (${direct.size} keys)")
    val spread = skewed.filter($"key" === "hot")
      .groupBy(Skew.saltOf($"id", 8).as("salt")).count()
      .orderBy("salt").as[(Int, Long)].collect()
    println("hot-key salt spread: " + spread.map { case (s, c) => s"$s->$c" }.mkString(" "))
    spark.stop()
  }
}
