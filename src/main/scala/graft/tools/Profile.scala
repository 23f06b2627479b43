package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.{Tables}
import graft.ops.{Dedup, Text}

/** Scratch profiling main (dev tool): times pipeline stages in isolation. */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Tables.configure(spark)
    val docs = Tables.documents(spark, sfDir)
    docs.write.format("noop").mode("overwrite").save() // warm

    def time(name: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"$name%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    time("scan only") {
      docs.write.format("noop").mode("overwrite").save()
    }
    time("tokens explode count") {
      docs.select(explode(split(lower(col("text")), "\\W+")).as("t"))
        .write.format("noop").mode("overwrite").save()
    }
    time("shingles explode") {
      docs.select(explode(Dedup.shinglesOfTokens(Text.tokens(col("text")))).as("s"))
        .write.format("noop").mode("overwrite").save()
    }
    time("shingles + 1 md5") {
      docs.select(explode(Dedup.shinglesOfTokens(Text.tokens(col("text")))).as("s"))
        .select(md5(col("s"))).write.format("noop").mode("overwrite").save()
    }
    time("shingles + 8 h32") {
      val e = docs.select(col("doc_id"), explode(Dedup.shinglesOfTokens(Text.tokens(col("text")))).as("s"))
      e.select(col("doc_id") +: (0 until 8).map(i => Text.h32(col("s"), i).as(s"h$i")): _*)
        .write.format("noop").mode("overwrite").save()
    }
    time("shingles + 8 md5 only") {
      val e = docs.select(col("doc_id"), explode(Dedup.shinglesOfTokens(Text.tokens(col("text")))).as("s"))
      e.select(col("doc_id") +: (0 until 8).map(i => md5(concat(lit(i.toString), col("s"))).as(s"h$i")): _*)
        .write.format("noop").mode("overwrite").save()
    }
    time("full minhash sigs") {
      Dedup.minhashSignatures(docs, "text", "doc_id").write.format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}
