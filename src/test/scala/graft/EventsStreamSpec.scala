package graft

import org.apache.spark.sql.functions._
import graft.api.QueryableState

/** End-to-end streaming over the driver's real `events` table: the parquet
  * file read as a STREAM (file source), windowed-aggregated with event time,
  * and served through queryable state — then checked against the identical
  * batch aggregation (batch/stream plan equivalence is the engine's core
  * design claim, SURVEY §7.1).
  */
class EventsStreamSpec extends SparkSpec {

  test("streaming tumbling agg over events.parquet equals the batch twin") {
    val dir = sf("sf0.001")
    val batch = Tables.events(spark, dir)
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("cnt"))
      .select(unix_millis(col("w.start")).as("w_start"), col("event_type"), col("cnt"))
      .collect().map(r => (r.getLong(0), r.getString(1)) -> r.getLong(2)).toMap

    // same pipeline, readStream file source (update mode + queryable state
    // so open windows are observable without watermark-close games)
    val stream = Tables.eventsStream(spark, dir)
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("cnt"))
      .select(unix_millis(col("w.start")).as("w_start"), col("event_type"), col("cnt"))
    val store = new QueryableState(Seq("w_start", "event_type"))
    val q = store.serve(stream)
    try {
      q.processAllAvailable()
      val streamed = store.all().map { case (k, r) =>
        (k.head.asInstanceOf[Long], k(1).asInstanceOf[String]) -> r.getLong(2)
      }
      assert(streamed === batch)
      assert(batch.nonEmpty)
    } finally q.stop()
  }
}
