package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Join surface (SURVEY §2.4) — batch twins of the windowed stream-stream
  * joins plus multi-way and (beyond-reference) semi/anti. The streaming
  * per-step golden behavior is covered in ScalaTest
  * (`JoinStreamSpec`); these batch twins are what the DuckDB oracle checks.
  *
  * Scale design:
  *  - window joins are equi-joins on the key with a time-range residual →
  *    shuffle-on-key sort-merge join, NOT a cartesian/theta join; state at
  *    streaming runtime is bounded by the watermark.
  *  - multi-way revenue broadcasts the small dimension (`customer`) so only
  *    the fact-fact join shuffles.
  */
object JoinQueries extends QueryModule {

  /** Events with epoch-µs long event time (portable to the oracle exactly). */
  private def ev(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d).withColumn("ts_us", expr("ts_ns div 1000"))

  private val windowUs: Long = 2L * 3600 * 1000000 // ±2h batch demo window

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // J1: inner windowed join — clicks ⋈ purchases on user within ±2h
    // (reference `StreamStreamJoinIntegrationTest.java:82`, JoinWindows.of).
    "j1_window_inner_join" -> ((s, d) => {
      val e = ev(s, d)
      val c = e.filter(col("event_type") === "click")
        .select(col("user_id"), col("event_id").as("click_id"), col("ts_us").as("cts"))
      val p = e.filter(col("event_type") === "purchase")
        .select(col("user_id").as("p_user"), col("event_id").as("purchase_id"), col("ts_us").as("pts"))
      c.join(p, col("user_id") === col("p_user") &&
          col("pts") >= col("cts") - windowUs && col("pts") <= col("cts") + windowUs)
        .select(col("user_id"), col("click_id"), col("purchase_id"),
          (col("pts") - col("cts")).as("lag_us"))
    }),

    // J2: left windowed join — unmatched clicks keep null purchase
    // (reference `:118-142`, expected "A-null").
    "j2_window_left_join" -> ((s, d) => {
      val e = ev(s, d)
      val c = e.filter(col("event_type") === "click")
        .select(col("user_id"), col("event_id").as("click_id"), col("ts_us").as("cts"))
      val p = e.filter(col("event_type") === "purchase")
        .select(col("user_id").as("p_user"), col("event_id").as("purchase_id"), col("ts_us").as("pts"))
      c.join(p, col("user_id") === col("p_user") &&
          col("pts") >= col("cts") - windowUs && col("pts") <= col("cts") + windowUs, "left")
        .select(col("user_id"), col("click_id"), col("purchase_id"))
    }),

    // J5: multi-way chained join — customer ⋈ orders ⋈ lineitem revenue per
    // segment (reference chains at `:232-261`). customer is broadcast.
    "j5_multiway_revenue" -> ((s, d) => {
      val li = Tables.lineitem(s, d)
      val o = Tables.orders(s, d)
      val c = Tables.customer(s, d)
      li.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(c), col("o_custkey") === col("c_custkey"))
        .groupBy("c_mktsegment")
        .agg(
          sum(col("l_extendedprice").cast("decimal(18,2)")).cast("double").as("revenue"),
          count(lit(1)).as("n_items"))
    }),

    // Beyond reference (free in Spark, declared as engine surface): semi/anti.
    "j_semi_anti" -> ((s, d) => {
      val o = Tables.orders(s, d)
      val c = Tables.customer(s, d)
      val withOrders = c.join(o, col("c_custkey") === col("o_custkey"), "left_semi")
        .select(col("c_custkey"), lit(true).as("has_orders"))
      val noOrders = c.join(o, col("c_custkey") === col("o_custkey"), "left_anti")
        .select(col("c_custkey"), lit(false).as("has_orders"))
      withOrders.unionByName(noOrders)
    }))

  val oracle: Map[String, String] = Map(
    "j1_window_inner_join" ->
      s"""SELECT c.user_id, c.event_id AS click_id, p.event_id AS purchase_id,
         |       epoch_us(p.ts) - epoch_us(c.ts) AS lag_us
         |FROM events c JOIN events p
         |  ON c.user_id = p.user_id
         | AND epoch_us(p.ts) BETWEEN epoch_us(c.ts) - $windowUs AND epoch_us(c.ts) + $windowUs
         |WHERE c.event_type = 'click' AND p.event_type = 'purchase'""".stripMargin,

    "j2_window_left_join" ->
      s"""SELECT c.user_id, c.event_id AS click_id, p.event_id AS purchase_id
         |FROM (SELECT * FROM events WHERE event_type = 'click') c
         |LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
         |  ON c.user_id = p.user_id
         | AND epoch_us(p.ts) BETWEEN epoch_us(c.ts) - $windowUs AND epoch_us(c.ts) + $windowUs""".stripMargin,

    "j5_multiway_revenue" ->
      """SELECT c_mktsegment,
        |  sum(l_extendedprice::DECIMAL(18,2))::DOUBLE AS revenue,
        |  count(*) AS n_items
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_mktsegment""".stripMargin,

    "j_semi_anti" ->
      """SELECT c_custkey, TRUE AS has_orders FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |UNION ALL
        |SELECT c_custkey, FALSE AS has_orders FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)""".stripMargin)
}
