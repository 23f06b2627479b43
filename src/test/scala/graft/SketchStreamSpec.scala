package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Streaming twins for the mergeable sketch family: the KLL quantile and
  * theta distinct aggregates running inside a real watermarked streaming
  * aggregation. What this proves beyond the batch specs: the
  * TypedImperativeAggregate buffers survive the state store's
  * serialize/restore between micro-batches (the same window fed across
  * several batches exercises restore + merge, not just in-memory update),
  * and the emitted sketch images are probe-able downstream exactly like
  * batch-built ones — the shape a live corpus-distribution monitor runs
  * (per-window length quantiles, per-window distinct overlap).
  */
class SketchStreamSpec extends SparkSpec {
  import spark.implicits._

  case class D(ts: Timestamp, source: String, len: Double)
  // MINUTE-ALIGNED epoch (1700000040000 ms = 28333334 exact minutes):
  // tumbling windows align to epoch minutes, so a misaligned t0 splits
  // the 0-45 s offsets across two windows (this spec's first version used
  // second 20 of a minute and flaked on exactly that)
  private val t0 = 1700000040000L
  private def at(offsetSec: Long) = new Timestamp(t0 + offsetSec * 1000)

  test("streaming windowed KLL sketches equal the batch twin after close") {
    implicit val ctx = spark.sqlContext
    val in = MemoryStream[D]
    val agg = in.toDF()
      .withWatermark("ts", "10 seconds")
      .groupBy(window($"ts", "1 minute").as("w"), $"source")
      .agg(graft.functions.Native.kllAgg($"len").as("qsketch"),
        count(lit(1)).as("n_rows"))
      .select(unix_millis($"w.start").as("w_start"), $"source", $"qsketch", $"n_rows")
    val q = agg.writeStream.format("memory").queryName("kll_stream")
      .outputMode("append").start()
    try {
      // one window's rows spread over THREE micro-batches: the sketch
      // buffer must round-trip the state store twice before the window
      // closes
      val b1 = Seq(D(at(0), "a", 10), D(at(5), "a", 30), D(at(7), "b", 5))
      val b2 = Seq(D(at(20), "a", 20), D(at(25), "b", 15))
      val b3 = Seq(D(at(40), "a", 40), D(at(45), "a", 50))
      in.addData(b1); q.processAllAvailable()
      in.addData(b2); q.processAllAvailable()
      in.addData(b3); q.processAllAvailable()
      assert(spark.table("kll_stream").count() === 0, "window still open")
      in.addData(D(at(130), "a", 1.0)) // watermark passes the first window
      q.processAllAvailable()
      val rows = spark.table("kll_stream")
        .withColumn("qs",
          graft.functions.Native.kllQuantiles(col("qsketch"), Seq(0.5, 1.0)))
        .select($"source", element_at($"qs", 1).as("p50"),
          element_at($"qs", 2).as("max"), $"n_rows")
        .as[(String, Double, Double, Long)].collect()
      assert(rows.length === 2, // one closed window per source — a keyed
        s"expected exactly 2 closed windows, got ${rows.toSeq}") // map would mask a split window
      val out = rows.map(r => r._1 -> r).toMap
      // exact regime (n << k): quantiles are exact over the fed values
      // a: {10,30,20,40,50} → p50=30 (cume_dist: 3/5 ≥ .5), max=50
      assert(out("a") === (("a", 30.0, 50.0, 5L)), s"${out("a")}")
      // b: {5,15} → p50=5 (1/2 ≥ .5), max=15
      assert(out("b") === (("b", 5.0, 15.0, 2L)), s"${out("b")}")
    } finally q.stop()
  }

  test("streaming windowed theta sketches support set algebra on emission") {
    implicit val ctx = spark.sqlContext
    val in = MemoryStream[D]
    val agg = in.toDF()
      .withWatermark("ts", "10 seconds")
      .groupBy(window($"ts", "1 minute").as("w"), $"source")
      .agg(graft.functions.Native.thetaAgg($"len").as("tsketch"))
      .select(unix_millis($"w.start").as("w_start"), $"source", $"tsketch")
    val q = agg.writeStream.format("memory").queryName("theta_stream")
      .outputMode("append").start()
    try {
      // source a sees {1..6}, source b sees {4..9}, across two batches
      in.addData((1 to 6).map(v => D(at(v), "a", v)) ++
        (4 to 7).map(v => D(at(v + 10), "b", v)): _*)
      q.processAllAvailable()
      in.addData(Seq(D(at(30), "b", 8), D(at(31), "b", 9), D(at(32), "b", 4)): _*)
      q.processAllAvailable()
      in.addData(D(at(130), "a", 1.0)) // close the window
      q.processAllAvailable()
      // overlap report over the EMITTED sketches (the raw rows are gone):
      // |a|=6, |b|=6, |a∩b|=3 ({4,5,6}), |a∪b|=9 — exact below capacity
      val sk = spark.table("theta_stream")
        .groupBy()
        .pivot("source", Seq("a", "b"))
        .agg(first("tsketch"))
      val r = sk.select(
        graft.functions.Native.thetaEstimate(col("a")).as("n_a"),
        graft.functions.Native.thetaEstimate(col("b")).as("n_b"),
        graft.functions.Native.thetaEstimate(
          graft.functions.Native.thetaIntersect(col("a"), col("b"))).as("n_common"),
        graft.functions.Native.thetaEstimate(
          graft.functions.Native.thetaUnionPair(col("a"), col("b"))).as("n_union"))
        .collect().head
      assert(r.getDouble(0) === 6.0, "n_a")
      assert(r.getDouble(1) === 6.0, "n_b")
      assert(r.getDouble(2) === 3.0, "n_common")
      assert(r.getDouble(3) === 9.0, "n_union")
    } finally q.stop()
  }
}
