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
