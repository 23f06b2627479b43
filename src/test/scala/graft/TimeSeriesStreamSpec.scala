package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.streaming.TimeSeriesStream
import graft.streaming.TimeSeriesStream.TsEvent

/** Drained-stream ≡ batch-operator equivalence for the time-series twins:
  * the streaming sessionize / resampleFill outputs, once the watermark has
  * passed everything, must equal [[graft.ops.TimeSeries]] on the same rows.
  */
class TimeSeriesStreamSpec extends SparkSpec {
  import spark.implicits._

  private val t0 = 1700000000000L
  private def at(sec: Long) = new Timestamp(t0 + sec * 1000)

  // two keys: key 1 has two sessions (gap 100s splits at 260s), key 2 one;
  // events added out of event-time order within a batch to exercise the
  // in-watermark sort
  private val events = Seq(
    TsEvent(1L, at(20), 2L, 5.0), TsEvent(1L, at(0), 1L, 3.0),
    TsEvent(1L, at(260), 3L, 7.0), TsEvent(1L, at(290), 4L, 9.0),
    TsEvent(2L, at(50), 5L, 4.0))

  private def batchDf = events.toDS()
    .select(col("key"), (unix_millis(col("ts")) * 1000L).as("ts_us"),
      col("ord"), col("value"))

  private def drained[T](makeQuery: MemoryStream[TsEvent] => org.apache.spark.sql.Dataset[T],
      name: String): org.apache.spark.sql.DataFrame = {
    implicit val ctx = spark.sqlContext
    val in = MemoryStream[TsEvent]
    val q = makeQuery(in).writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    try {
      in.addData(events: _*)
      q.processAllAvailable()
      // two far-future nudges on an unused key: the first advances the
      // watermark past every gap/grid end, the second runs the batch in
      // which the event-time timeouts actually fire
      in.addData(TsEvent(99L, at(100000), 100L, 0.0))
      q.processAllAvailable()
      in.addData(TsEvent(99L, at(200000), 101L, 0.0))
      q.processAllAvailable()
      spark.table(name).filter(col("key") =!= 99L)
    } finally q.stop()
  }

  test("streaming sessionize drains to the batch session assignment") {
    val got = drained(in => TimeSeriesStream.sessionize(in.toDS(), gapUs = 100000000L,
      watermark = "10 seconds"), "ts_sess_stream")
      .select("key", "ord", "session_id")
    val want = graft.ops.TimeSeries.sessionize(batchDf, "key", "ts_us", "ord",
      gapUs = 100000000L)
      .select("key", "ord", "session_id")
    assert(got.as[(Long, Long, Long)].collect().toSet ===
      want.as[(Long, Long, Long)].collect().toSet)
    assert(got.count() === events.size)
  }

  test("streaming rollingAnomalies drains to the batch flags (incl. a true flag)") {
    val got = drained(in => TimeSeriesStream.rollingAnomalies(in.toDS(),
      width = 3, k = 2, watermark = "10 seconds"), "ts_anom_stream")
      .select("key", "ord", "anomaly", "hist_n")
    val want = graft.ops.TimeSeries.rollingAnomalies(batchDf, "key", "ts_us",
      "ord", "value", width = 3, k = 2)
      .select("key", "ord", "anomaly", "hist_n")
    assert(got.as[(Long, Long, Boolean, Long)].collect().toSet ===
      want.as[(Long, Long, Boolean, Long)].collect().toSet)
    assert(got.count() === events.size)
    // the fixture's key-1 ramp (3,5,7 then 9) trips the 2-sigma flag at ord 4
    // — the equivalence above is not vacuously all-false
    assert(got.filter(col("anomaly")).as[(Long, Long, Boolean, Long)]
      .collect().map(_._2).toSet === Set(4L))
  }

  test("streaming ewma drains to the batch weighted fold") {
    // stepUs 10s: each fixture event sits in its own bucket per key (the
    // regular-grid input contract); batch twin buckets the same way
    val got = drained(in => TimeSeriesStream.ewma(in.toDS(), stepUs = 10000000L,
      width = 4, decayNum = 1, decayDen = 2, watermark = "10 seconds"),
      "ts_ewma_stream")
      .select("key", "bucket", "ewma_cents")
    val want = graft.ops.TimeSeries.ewma(
      batchDf.withColumn("bucket", expr("ts_us div 10000000")),
      "key", "bucket", "value", width = 4, decayNum = 1, decayDen = 2)
      .select("key", "bucket", "ewma_cents")
    assert(got.as[(Long, Long, Long)].collect().toSet ===
      want.as[(Long, Long, Long)].collect().toSet)
    assert(got.count() === events.size)
    // hand pin (not vacuous): key 1's last bucket folds 8·900+4·700+2·500+1·300
    // over 15 = 6733 cents
    assert(got.filter(col("key") === 1L).orderBy(col("bucket").desc)
      .as[(Long, Long, Long)].head()._3 === (8L * 900 + 4 * 700 + 2 * 500 + 300) / 15)
  }

  test("streaming resampleFill drains to the batch grid (gap buckets filled)") {
    val got = drained(in => TimeSeriesStream.resampleFill(in.toDS(), stepUs = 60000000L,
      watermark = "10 seconds"), "ts_fill_stream")
      .select("key", "bucket", "filled", "observed")
    val want = graft.ops.TimeSeries.resampleFill(batchDf, "key", "ts_us", "ord",
      "value", stepUs = 60000000L)
      .select(col("key"), col("bucket"), col("filled"), col("observed"))
    assert(got.as[(Long, Long, Double, Boolean)].collect().toSet ===
      want.as[(Long, Long, Double, Boolean)].collect().toSet)
    // row-for-row (no dup emissions), and the grid is wider than the five
    // observations — the silent stretch between 20s and 260s is filled
    assert(got.count() === want.count())
    assert(want.count() > events.size)
  }
}
