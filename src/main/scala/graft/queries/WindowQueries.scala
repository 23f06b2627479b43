package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Windowed aggregation surface (SURVEY §2.5, W1-W3): tumbling, sliding and
  * session windows over `events.ts`, as batch twins of the streaming
  * `window()` / `session_window()` aggregations (streaming versions are
  * exercised in ScalaTest with watermarks).
  *
  * Window starts are emitted as epoch-ms longs so the DuckDB oracle (which
  * reconstructs the same windows with time_bucket / gaps-and-islands) hashes
  * identically. `value` sums go through DECIMAL(9,2) for order-independent
  * exact arithmetic.
  */
object WindowQueries extends QueryModule {

  private def ev(s: SparkSession, d: String): DataFrame = Tables.events(s, d)

  private def sumValue = sum(col("value").cast("decimal(9,2)")).cast("double")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // W1: tumbling 1h per event_type
    "w1_tumbling_agg" -> ((s, d) =>
      ev(s, d)
        .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
        .agg(count(lit(1)).as("cnt"), sumValue.as("sum_value"))
        .select(unix_millis(col("w.start")).as("w_start"), col("event_type"),
          col("cnt"), col("sum_value"))),

    // W2: sliding 1h window every 30min (each event lands in 2 windows)
    "w2_sliding_agg" -> ((s, d) =>
      ev(s, d)
        .groupBy(window(col("ts"), "1 hour", "30 minutes").as("w"))
        .agg(count(lit(1)).as("cnt"), sumValue.as("sum_value"))
        .select(unix_millis(col("w.start")).as("w_start"), col("cnt"), col("sum_value"))),

    // W3: session windows with 30min inactivity gap, per user
    "w3_session_agg" -> ((s, d) =>
      ev(s, d)
        .groupBy(session_window(col("ts"), "30 minutes").as("w"), col("user_id"))
        .agg(count(lit(1)).as("cnt"))
        .select(col("user_id"), unix_millis(col("w.start")).as("session_start"), col("cnt"))))

  val oracle: Map[String, String] = Map(
    "w1_tumbling_agg" ->
      """SELECT epoch_ms(time_bucket(INTERVAL 1 HOUR, ts)) AS w_start, event_type,
        |  count(*) AS cnt, sum("value"::DECIMAL(9,2))::DOUBLE AS sum_value
        |FROM events GROUP BY 1, 2""".stripMargin,

    // every event belongs to the 30min-aligned window at floor30(ts) and the
    // one starting 30min earlier
    "w2_sliding_agg" ->
      """WITH e AS (SELECT time_bucket(INTERVAL 30 MINUTES, ts) AS tb, "value" FROM events),
        |x AS (
        |  SELECT epoch_ms(tb) AS w_start, "value" FROM e
        |  UNION ALL
        |  SELECT epoch_ms(tb - INTERVAL 30 MINUTES) AS w_start, "value" FROM e)
        |SELECT w_start, count(*) AS cnt, sum("value"::DECIMAL(9,2))::DOUBLE AS sum_value
        |FROM x GROUP BY w_start""".stripMargin,

    // gaps-and-islands: new session when gap >= 30min (Spark session_window
    // merges only while next.ts < prev.ts + gap)
    "w3_session_agg" ->
      """WITH e AS (
        |  SELECT user_id, ts,
        |    CASE WHEN lag(ts) OVER w IS NULL
        |           OR ts - lag(ts) OVER w >= INTERVAL 30 MINUTES
        |         THEN 1 ELSE 0 END AS new_s
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
        |g AS (
        |  SELECT user_id, ts,
        |    sum(new_s) OVER (PARTITION BY user_id ORDER BY ts
        |                     ROWS UNBOUNDED PRECEDING) AS sid
        |  FROM e)
        |SELECT user_id, epoch_ms(min(ts)) AS session_start, count(*) AS cnt
        |FROM g GROUP BY user_id, sid""".stripMargin)
}
