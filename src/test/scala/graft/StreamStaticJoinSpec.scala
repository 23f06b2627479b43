package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Stream-static enrichment join (the KTable/GlobalKTable-style lookup the
  * reference links but never exercises — free in Spark, declared as engine
  * surface): a streaming fact joins a static dimension; the dim is
  * broadcast, no streaming state needed.
  */
class StreamStaticJoinSpec extends SparkSpec {
  import spark.implicits._

  case class Click(userKey: Long, page: String, ts: Timestamp)

  test("streaming facts enrich against a static dimension") {
    implicit val ctx = spark.sqlContext
    val dim = Seq((1L, "alice", "emea"), (2L, "bob", "apac")).toDF("userKey", "name", "region")
    val in = MemoryStream[Click]
    val joined = in.toDF()
      .join(broadcast(dim), Seq("userKey"), "left")
      .select($"page", coalesce($"name", lit("unknown")).as("who"), $"region")
    val q = joined.writeStream.format("memory").queryName("enrich")
      .outputMode("append").start()
    try {
      val t = new Timestamp(1700000000000L)
      in.addData(Click(1L, "/home", t), Click(2L, "/docs", t), Click(9L, "/404", t))
      q.processAllAvailable()
      val rows = spark.table("enrich").as[(String, String, String)].collect().toSet
      assert(rows === Set(
        ("/home", "alice", "emea"),
        ("/docs", "bob", "apac"),
        ("/404", "unknown", null)))
    } finally q.stop()
  }
}
