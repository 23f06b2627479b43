package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.ops.Text

/** The reference's flagship topology as a streaming query: Kafka Streams
  * `stream → flatMapValues(split \W+) → groupBy(word) → count` in update
  * output mode (reference `KafkaWordCount.java:56-67`), asserted against the
  * exact golden counts of `KafkaWordCountTest.java:152-160` (FIXTURES.md F1).
  */
class WordCountStreamSpec extends SparkSpec {
  import spark.implicits._

  private val lines = Seq(
    "To be, or not to be,--that is the question:--",
    "Whether 'tis nobler in the mind to suffer",
    "The slings and arrows of outrageous fortune",
    "Or to take arms against a sea of troubles,")

  /** Golden final counts from the reference test. */
  private val golden = Map(
    "to" -> 4L, "be" -> 2L, "or" -> 2L, "the" -> 3L, "not" -> 1L,
    "that" -> 1L, "is" -> 1L, "question" -> 1L, "whether" -> 1L)

  /** Memory-sink rows in update mode accumulate per-batch updates; counts
    * only grow, so the final state per word is the max.
    */
  private def finalCounts(sinkTable: String): Map[String, Long] =
    spark.table(sinkTable).groupBy("word").agg(max("cnt").as("cnt"))
      .as[(String, Long)].collect().toMap

  test("update-mode streaming word count matches the reference goldens (A1-A3)") {
    implicit val ctx = spark.sqlContext
    val input = MemoryStream[String]
    val counts = Text.wordCount(input.toDF().toDF("text"), "text")
    val q = counts.writeStream.format("memory").queryName("wc_stream")
      .outputMode("update").start()
    try {
      input.addData(lines: _*)
      q.processAllAvailable()
      val res = finalCounts("wc_stream")
      golden.foreach { case (w, c) => assert(res.get(w).contains(c), s"word $w") }
    } finally q.stop()
  }

  test("per-record emission and single-batch emission converge (A4 cache on/off)") {
    implicit val ctx = spark.sqlContext
    // "cache off" analogue: one micro-batch per input line (emit every update)
    val in1 = MemoryStream[String]
    val q1 = Text.wordCount(in1.toDF().toDF("text"), "text")
      .writeStream.format("memory").queryName("wc_step").outputMode("update").start()
    try {
      lines.foreach { l => in1.addData(l); q1.processAllAvailable() }
    } finally q1.stop()
    // "cache on" analogue: all lines coalesced into one micro-batch
    val in2 = MemoryStream[String]
    val q2 = Text.wordCount(in2.toDF().toDF("text"), "text")
      .writeStream.format("memory").queryName("wc_batch").outputMode("update").start()
    try { in2.addData(lines: _*); q2.processAllAvailable() } finally q2.stop()

    assert(finalCounts("wc_step") === finalCounts("wc_batch"))
    // per-record run emitted MORE intermediate updates than the coalesced one
    assert(spark.table("wc_step").count() >= spark.table("wc_batch").count())
  }

  test("streaming result equals batch result on the same corpus") {
    implicit val ctx = spark.sqlContext
    val in = MemoryStream[String]
    val q = Text.wordCount(in.toDF().toDF("text"), "text")
      .writeStream.format("memory").queryName("wc_vs_batch").outputMode("update").start()
    try { in.addData(lines: _*); q.processAllAvailable() } finally q.stop()
    val batch = Text.wordCount(lines.toDF("text"), "text")
      .as[(String, Long)].collect().toMap
    assert(finalCounts("wc_vs_batch") === batch)
  }
}
