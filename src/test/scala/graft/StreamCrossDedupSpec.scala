package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions.col
import graft.ops.Dedup
import graft.streaming.StreamingLsh

/** Stream-vs-static cross-corpus dedup: an arriving document stream is
  * verified against a static reference corpus, statelessly (no watermark,
  * no state store), and the drained matches equal the batch
  * [[Dedup.crossCorpusPairs]] on the same inputs.
  */
class StreamCrossDedupSpec extends SparkSpec {
  import spark.implicits._

  private val base = "the quick brown fox jumps over the lazy dog near the river bank today"

  private val ref = Seq(
    (1L, base),
    (2L, "reference material about astrophysics galaxies and orbital mechanics"),
    (3L, "short doc")).toDF("doc_id", "text")

  test("drained stream matches equal the batch cross-corpus pairs") {
    implicit val ctx = spark.sqlContext
    val probeRows = Seq(
      (101L, base.replace("today", "tonight")),      // near-dup of ref 1
      (102L, "a novel document about distributed query engines and shuffles"),
      (103L, base))                                  // exact copy of ref 1
    val input = MemoryStream[(Long, String)]
    val q = StreamingLsh.crossCorpusMatches(
        input.toDF().toDF("doc_id", "text"), ref, "text", "doc_id", minJaccard = 0.5)
      .writeStream.format("memory").queryName("xcorpus").outputMode("append").start()
    try {
      input.addData(probeRows.take(2): _*); q.processAllAvailable()
      input.addData(probeRows.drop(2): _*); q.processAllAvailable()
      val streamed = spark.table("xcorpus")
        .select("doc_id", "ref_id").as[(Long, Long)].collect().toSet
      val batch = Dedup.crossCorpusPairs(
          probeRows.toDF("doc_id", "text"), ref, "text", "doc_id", minJaccard = 0.5)
        .select("probe_id", "ref_id").as[(Long, Long)].collect().toSet
      assert(streamed == batch)
      assert(streamed.contains((101L, 1L)) && streamed.contains((103L, 1L)))
      assert(!streamed.exists(_._1 == 102L), "novel doc must emit no match")
    } finally q.stop()
  }

  test("each verified pair is emitted exactly once even when both bands hit") {
    implicit val ctx = spark.sqlContext
    val input = MemoryStream[(Long, String)]
    val q = StreamingLsh.crossCorpusMatches(
        input.toDF().toDF("doc_id", "text"), ref, "text", "doc_id", minJaccard = 0.8)
      .writeStream.format("memory").queryName("xcorpus_once").outputMode("append").start()
    try {
      // exact copy: identical signatures → the SAME ref appears in both
      // band buckets; the per-row candidate union must still verify once
      input.addData((500L, base)); q.processAllAvailable()
      val rows = spark.table("xcorpus_once")
        .select("doc_id", "ref_id").as[(Long, Long)].collect().toSeq
      assert(rows == Seq((500L, 1L)))
    } finally q.stop()
  }

  test("the query plan carries no stateful operator") {
    implicit val ctx = spark.sqlContext
    val input = MemoryStream[(Long, String)]
    val q = StreamingLsh.crossCorpusMatches(
        input.toDF().toDF("doc_id", "text"), ref, "text", "doc_id")
      .writeStream.format("memory").queryName("xcorpus_plan").outputMode("append").start()
    try {
      input.addData((9L, base)); q.processAllAvailable()
      // stateless contract: nothing to checkpoint beyond offsets — no
      // stateful operators reported for the executed micro-batch
      assert(q.lastProgress.stateOperators.isEmpty,
        s"expected stateless plan, got ${q.lastProgress.stateOperators.length} state operators")
    } finally q.stop()
  }
}
