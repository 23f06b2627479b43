package graft
// (embedding-stream twin tested below alongside the text path)

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.streaming.StreamingLsh

/** Streaming LSH near-dup detection: a later near-identical doc is flagged
  * against the earlier one ACROSS micro-batches (bucket state persists),
  * same-batch duplicates resolve to the min id, unrelated docs stay clean,
  * and the bucket keys agree with the batch lshBands pipeline.
  */
class StreamingLshSpec extends SparkSpec {
  import spark.implicits._

  private val base = "the quick brown fox jumps over the lazy dog again and again today"

  /** All (doc, band, rep) rows the memory sink accumulated. */
  private def rows(sink: String): Seq[(Long, Int, Long)] =
    spark.table(sink).as[(Long, Int, Long)].collect().toSeq

  test("near-dups are flagged across and within micro-batches; clean docs are not") {
    implicit val ctx = spark.sqlContext
    val input = MemoryStream[(Long, String)]
    val out = StreamingLsh.bucketFirstSeen(
      input.toDF().toDF("doc_id", "text"), "text", "doc_id")
    val q = out.writeStream.format("memory").queryName("lsh_stream")
      .outputMode("append").start()
    try {
      input.addData((100L, base), (300L, base + " extra"), (301L, base + " extra"))
      q.processAllAvailable()
      input.addData((200L, base), (999L, "completely different content about query engines and shuffles"))
      q.processAllAvailable()

      val r = rows("lsh_stream")
      // batch 1: 100 is first in its buckets; 301 hits 300's buckets
      assert(r.filter(_._1 == 100L).forall(_._3 == 100L))
      assert(r.filter(_._1 == 301L).exists(_._3 < 301L), "same-batch dup must see a lower rep")
      // batch 2: 200 (same text as 100) must hit 100's bucket state
      assert(r.filter(_._1 == 200L).exists(_._3 == 100L), "cross-batch dup must see earlier rep")
      // the unrelated doc is its own representative everywhere
      assert(r.filter(_._1 == 999L).forall(_._3 == 999L))
    } finally q.stop()
  }

  test("inline per-row band keys equal the batch explode+agg lshBands keys exactly") {
    // the two signature paths (per-row array_min vs explode→groupBy min)
    // must produce identical buckets, or streaming and batch dedup would
    // silently disagree on who is whose near-dup
    val docs = Seq((1L, base), (2L, "another body of text entirely, with different words"),
      (3L, "x"), (4L, "")).toDF("doc_id", "text") // incl. <3-token fallback docs
    val batch = graft.ops.Dedup.lshBands(docs, "text", "doc_id")
      .as[(Long, Int, String)].collect().toSet
    val inline = StreamingLsh.withBandKeys(docs, "text", "doc_id", 8, 2)
      .as[(Long, Int, String)].collect().toSet
    assert(inline === batch)
  }

  test("dedup horizon: bucket state evicts on the data's own clock; re-arrivals restart") {
    implicit val ctx = spark.sqlContext
    def ts(s: Long) = new java.sql.Timestamp(s * 1000L)
    val other = "completely different content about query engines and shuffles"
    val input = MemoryStream[(Long, String, java.sql.Timestamp)]
    val q = graft.streaming.StreamingLsh.bucketFirstSeenWithHorizon(
        input.toDF().toDF("doc_id", "text", "ts"), "text", "doc_id", "ts",
        watermark = "0 seconds", horizonMs = 60_000L)
      .toDF("doc_id", "band", "rep")
      .writeStream.format("memory").queryName("lsh_horizon").outputMode("append").start()
    try {
      // start past t=0: the initial watermark is 0 and rows AT the
      // watermark are dropped as late
      input.addData((100L, base, ts(100))); q.processAllAvailable()
      // within the horizon: the duplicate sees 100's state
      input.addData((200L, base, ts(130))); q.processAllAvailable()
      // push the watermark far past 100/200's horizon via an unrelated doc,
      // then once more so the timeout actually fires and evicts
      input.addData((900L, other, ts(700))); q.processAllAvailable()
      input.addData((901L, other, ts(710))); q.processAllAvailable()
      // same text again, beyond the horizon: must be its OWN representative
      input.addData((300L, base, ts(720))); q.processAllAvailable()
      val r = rows("lsh_horizon")
      assert(r.filter(_._1 == 200L).exists(_._3 == 100L),
        s"in-horizon dup must see earlier rep; all rows: $r")
      assert(r.filter(_._1 == 300L).forall(_._3 == 300L),
        s"post-horizon arrival must restart the bucket: $r")
    } finally q.stop()
  }

  test("embedding stream: bucket-mates flag against the first-seen vector") {
    implicit val ctx = spark.sqlContext
    val dim = 8
    def v(xs: Double*): Seq[Float] = xs.map(_.toFloat)
    val a = v(1, 0.01, 0, 0, 0, 0, 0, 0)      // near-identical pair → same bucket
    val a2 = v(0.99, 0.012, 0, 0, 0, 0, 0, 0)
    val b = v(-1, -1, -1, -1, -1, -1, -1, -1) // far away
    val input = MemoryStream[(Long, Seq[Float])]
    val q = StreamingLsh.embeddingBucketFirstSeen(
        input.toDF().toDF("vec_id", "embedding"), "embedding", "vec_id", dim)
      .toDF("vec_id", "bucket", "rep")
      .writeStream.format("memory").queryName("emb_lsh").outputMode("append").start()
    try {
      input.addData((10L, a), (30L, b)); q.processAllAvailable()
      input.addData((20L, a2)); q.processAllAvailable()  // cross-batch near-dup
      val rows = spark.table("emb_lsh")
        .as[(Long, Int, Long)].collect()
      val byId = rows.groupBy(_._1)
      // 20 lands in 10's bucket and sees 10 as representative
      assert(byId(20L).exists(_._3 == 10L), s"$rows")
      // first arrivals are their own representatives
      assert(byId(10L).forall(_._3 == 10L) && byId(30L).forall(_._3 == 30L))
    } finally q.stop()
  }
}
