package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.api.{QueryableState, Topology}
import graft.ops.Text

/** SMT chain (S11), union-of-sources routing (S10) and queryable state
  * (the `store.all()` interactive-query analogue,
  * `AbstractJoinIntegrationTest.java:268-281`).
  */
class TopologySpec extends SparkSpec {
  import spark.implicits._

  test("S11: SMT chain applies ordered transforms; null-result = dropped record") {
    val chain = Topology.smtChain(
      _.filter(col("v") > 1),                      // drop records (null-result analogue)
      _.withColumn("v2", col("v") * 10),           // per-record transform
      _.select(col("k"), col("v2")))               // projection
    val out = chain(Seq(("a", 1), ("b", 2), ("c", 3)).toDF("k", "v"))
    assert(out.columns.toSeq === Seq("k", "v2"))
    assert(out.as[(String, Int)].collect().toSet === Set(("b", 20), ("c", 30)))
  }

  test("S10: union of streaming sources merges topics (WrappedConsumer.poll analogue)") {
    implicit val ctx = spark.sqlContext
    val t1 = MemoryStream[String]
    val t2 = MemoryStream[String]
    val merged = Topology.unionSources(Seq(
      t1.toDF().toDF("line").withColumn("topic", lit("t1")),
      t2.toDF().toDF("line").withColumn("topic", lit("t2"))))
    val q = merged.groupBy("topic").count()
      .writeStream.format("memory").queryName("union_sink").outputMode("complete").start()
    try {
      t1.addData("a b", "c")
      t2.addData("d")
      q.processAllAvailable()
      val counts = spark.table("union_sink").as[(String, Long)].collect().toMap
      assert(counts === Map("t1" -> 2L, "t2" -> 1L))
    } finally q.stop()
  }

  test("queryable state serves latest per-key values of an update-mode aggregate") {
    implicit val ctx = spark.sqlContext
    val in = MemoryStream[String]
    val store = new QueryableState(Seq("word"))
    val q = store.serve(Text.wordCount(in.toDF().toDF("text"), "text"))
    try {
      in.addData("to be or not to be")
      q.processAllAvailable()
      assert(store.get("to").map(_.getLong(1)).contains(2L))
      in.addData("to err is human")
      q.processAllAvailable()
      assert(store.get("to").map(_.getLong(1)).contains(3L))  // latest wins
      assert(store.all().size >= 6)
    } finally q.stop()
  }

  test("queryable state refuses to grow past maxKeys — loud stop, not an OOM") {
    implicit val ctx = spark.sqlContext
    val in = MemoryStream[String]
    val store = new QueryableState(Seq("word"), maxKeys = 4)
    val q = store.serve(Text.wordCount(in.toDF().toDF("text"), "text"))
    try {
      in.addData("w1 w2 w3 w4 w5 w6")
      val e = intercept[Exception](q.processAllAvailable())
      assert(e.getMessage.contains("maxKeys") ||
        Option(e.getCause).exists(_.getMessage.contains("maxKeys")),
        s"expected the maxKeys guard to fail the stream, got: $e")
    } finally q.stop()
  }
}
