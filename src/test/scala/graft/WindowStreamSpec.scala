package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Streaming windowed aggregations with watermarks (W1/W3 streaming twins +
  * T1): append-mode tumbling windows emit exactly once when the watermark
  * passes window end; session windows merge by inactivity gap.
  */
class WindowStreamSpec extends SparkSpec {
  import spark.implicits._

  case class E(ts: Timestamp, kind: String, value: Double)
  private val t0 = 1700000000000L // aligned well inside an hour bucket
  private def at(offsetSec: Long) = new Timestamp(t0 + offsetSec * 1000)

  test("W1 streaming: tumbling window emits closed windows once watermark passes") {
    implicit val ctx = spark.sqlContext
    val in = MemoryStream[E]
    val agg = in.toDF()
      .withWatermark("ts", "10 seconds")
      .groupBy(window($"ts", "1 minute").as("w"), $"kind")
      .agg(count(lit(1)).as("cnt"))
      .select(unix_millis($"w.start").as("w_start"), $"kind", $"cnt")
    val q = agg.writeStream.format("memory").queryName("w1_stream")
      .outputMode("append").start()
    try {
      in.addData(E(at(0), "a", 1.0), E(at(10), "a", 2.0), E(at(20), "b", 1.0))
      q.processAllAvailable()
      // window still open: nothing emitted in append mode
      assert(spark.table("w1_stream").count() === 0)
      // event 2 minutes later pushes the watermark past the first window
      in.addData(E(at(130), "a", 1.0))
      q.processAllAvailable()
      in.addData(E(at(260), "a", 1.0)) // close the second window too
      q.processAllAvailable()
      val rows = spark.table("w1_stream").as[(Long, String, Long)].collect().toSet
      val w0 = t0 / 60000 * 60000
      assert(rows.contains((w0, "a", 2L)))
      assert(rows.contains((w0, "b", 1L)))
    } finally q.stop()
  }

  test("W3 streaming: session windows merge by 30s inactivity gap") {
    implicit val ctx = spark.sqlContext
    val in = MemoryStream[E]
    val agg = in.toDF()
      .withWatermark("ts", "10 seconds")
      .groupBy(session_window($"ts", "30 seconds").as("w"), $"kind")
      .agg(count(lit(1)).as("cnt"))
      .select($"kind", unix_millis($"w.start").as("s_start"), $"cnt")
    val q = agg.writeStream.format("memory").queryName("w3_stream")
      .outputMode("append").start()
    try {
      // one session: gaps < 30s; then silence > 30s; then a new session
      in.addData(E(at(0), "a", 1.0), E(at(20), "a", 1.0), E(at(39), "a", 1.0))
      q.processAllAvailable()
      in.addData(E(at(200), "a", 1.0)) // advances watermark, closes session 1
      q.processAllAvailable()
      in.addData(E(at(400), "a", 1.0)) // closes session 2
      q.processAllAvailable()
      val rows = spark.table("w3_stream").as[(String, Long, Long)].collect().toSet
      assert(rows.contains(("a", t0, 3L)))        // merged 3-event session
      assert(rows.contains(("a", t0 + 200000, 1L)))
    } finally q.stop()
  }

  test("W3 streaming: sessions grow and merge across batches (complete mode); update mode is rejected") {
    implicit val ctx = spark.sqlContext
    def sessions(src: org.apache.spark.sql.DataFrame) = src
      .withWatermark("ts", "10 seconds")
      .groupBy(session_window($"ts", "30 seconds").as("w"), $"kind")
      .agg(count(lit(1)).as("cnt"))
      .select($"kind", unix_millis($"w.start").as("s_start"),
        unix_millis($"w.end").as("s_end"), $"cnt")
    // Spark pins session windows to append/complete: update mode is an
    // analysis error (STREAMING_OUTPUT_MODE.UNSUPPORTED_OPERATION) — assert
    // it so an engine upgrade that lifts the restriction is noticed
    val inBad = MemoryStream[E]
    val ex = intercept[org.apache.spark.sql.AnalysisException] {
      sessions(inBad.toDF()).writeStream.format("memory")
        .queryName("w3_bad").outputMode("update").start()
    }
    assert(ex.getMessage.contains("STREAMING_OUTPUT_MODE"))
    // complete mode shows the per-batch PARTIAL state: a session re-emits
    // grown/merged as later events arrive inside the gap
    val in = MemoryStream[E]
    val q = sessions(in.toDF()).writeStream.format("memory")
      .queryName("w3_complete").outputMode("complete").start()
    try {
      def rows = spark.table("w3_complete").as[(String, Long, Long, Long)].collect().toSeq
      // batch 1: single event → partial session [t0, t0+30s), visible NOW
      in.addData(E(at(0), "a", 1.0))
      q.processAllAvailable()
      assert(rows === Seq(("a", t0, t0 + 30000, 1L)))
      // batch 2: +20s lands inside the gap → same session, end pushed out
      in.addData(E(at(20), "a", 1.0))
      q.processAllAvailable()
      assert(rows === Seq(("a", t0, t0 + 50000, 2L)))
      // batch 3: two events bridge the remaining gap → ONE merged session
      in.addData(E(at(45), "a", 1.0), E(at(70), "a", 1.0))
      q.processAllAvailable()
      assert(rows === Seq(("a", t0, t0 + 100000, 4L)))
      // final state equals the batch session_window over the same events —
      // the same final-state-equivalence contract as the stream-stream joins
      val batch = Seq((at(0), "a"), (at(20), "a"), (at(45), "a"), (at(70), "a"))
        .toDF("ts", "kind")
        .groupBy(session_window($"ts", "30 seconds").as("w"), $"kind")
        .agg(count(lit(1)).as("cnt"))
        .select($"kind", unix_millis($"w.start").as("s_start"),
          unix_millis($"w.end").as("s_end"), $"cnt")
        .as[(String, Long, Long, Long)].collect().toSeq
      assert(batch === rows)
    } finally q.stop()
  }

  test("T2 at scale: aggregation runs on the RocksDB state store provider") {
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      implicit val ctx = spark.sqlContext
      val in = MemoryStream[String]
      val q = graft.ops.Text.wordCount(in.toDF().toDF("text"), "text")
        .writeStream.format("memory").queryName("rocks_wc").outputMode("update").start()
      try {
        in.addData("to be or not to be")
        q.processAllAvailable()
        val counts = spark.table("rocks_wc").as[(String, Long)].collect().toMap
        assert(counts("to") === 2L && counts("be") === 2L)
      } finally q.stop()
    } finally {
      prev match {
        case Some(p) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }
}
