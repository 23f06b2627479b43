package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.api.StreamRegistry
import graft.ops.Text.floor6

/** Projection / filter / per-record transform / aggregation surface (SURVEY
  * §2.2, §2.3, §2.7) as batch twins over the driver's tables, each with a
  * DuckDB oracle. The P5-P13 queries run through [[StreamRegistry]] SQL —
  * the same path a streaming CSAS takes — so the KSQL pseudo-column and
  * CSAS semantics (reference `StreamsSelectAndProjectIntTest.java`) are what
  * is actually under test, while Catalyst still sees plain declarative plans
  * (pushdown + pruning reach the parquet scan).
  */
object RelationalQueries extends QueryModule {

  /** `orders` registered as a KSQL-style stream: key = o_orderkey, event
    * time = o_orderdate (reference orders fixture keys on ORDERTIME,
    * `OrderDataProvider.java:51-115`; ours keys on the primary key).
    */
  private def ordersStream(s: SparkSession, d: String): StreamRegistry = {
    val reg = new StreamRegistry(s)
    reg.createStream("orders_s", Tables.orders(s, d),
      keyCol = Some("o_orderkey"), timeCol = Some("o_orderdate"))
    reg
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // P1: map = 1→1 rekey + revalue (reference `DatabaseWordCount.java:126-133`)
    "p1_map_rekey" -> ((s, d) =>
      Tables.events(s, d).select(
        concat(lit("u"), col("user_id")).as("new_key"),
        (col("value") * 2).as("doubled"),
        col("event_id"))),

    // P3: flatMap 1→N records (reference `StreamStreamJoinIntegrationTest.java:110`)
    "p3_flatmap_records" -> ((s, d) =>
      Tables.events(s, d).select(
        col("event_id"),
        explode(array(
          struct(lit("type").as("tag"), col("event_type").as("v")),
          struct(lit("user").as("tag"), col("user_id").cast("string").as("v")))).as("kv"))
        .select(col("event_id"), col("kv.tag").as("tag"), col("kv.v").as("v"))),

    // P5: KSQL projection SELECT a,b,c (reference `StreamsSelectAndProjectIntTest.java:247-248`)
    "p5_projection" -> ((s, d) => {
      val reg = ordersStream(s, d)
      reg.createStreamAs("p5", "SELECT o_orderkey, o_totalprice, o_orderpriority FROM orders_s")
    }),

    // P6+P9: SELECT * including ROWKEY/ROWTIME pseudo-columns (`:293`)
    "p6_select_star" -> ((s, d) => {
      val reg = ordersStream(s, d)
      reg.createStreamAs("p6", "SELECT * FROM orders_s")
    }),

    // P7+P8+P10: alias + arithmetic + WHERE conjunction (`:175-178`)
    "p7_alias_arith_filter" -> ((s, d) => {
      val reg = ordersStream(s, d)
      reg.createStreamAs("p7",
        """SELECT ROWKEY AS RKEY, ROWTIME + 10000 AS RTIME, o_orderpriority
          |FROM orders_s
          |WHERE o_totalprice > 150000 AND o_orderstatus = 'F'""".stripMargin)
    }),

    // P10: SELECT * WHERE via the textual CSAS statement surface (the
    // reference's literal shape, `:312`: CREATE STREAM BIGORDERS AS ...)
    "p10_filter" -> ((s, d) => {
      val reg = ordersStream(s, d)
      reg.sql("CREATE STREAM p10 AS SELECT * FROM orders_s WHERE o_totalprice > 100000;")
    }),

    // P12: timestamp reassignment WITH (timestamp='RTIME') (`:174-209`):
    // the derived stream's ROWTIME must equal the computed RTIME column.
    "p12_timestamp_reassign" -> ((s, d) => {
      val reg = ordersStream(s, d)
      reg.createStreamAs("p12",
        "SELECT ROWKEY, ROWTIME + 10000 AS RTIME FROM orders_s",
        timestampCol = Some("RTIME"))
      reg.stream("p12").df.select(col("ROWKEY"), col("RTIME"), col("ROWTIME"))
    }),

    // P13: bad-record tolerance (`shouldSkipBadData`, `:151-166`): a corrupt
    // JSON record unioned into the feed is skipped, query still answers.
    "p13_bad_records" -> ((s, d) => {
      val ev = Tables.events(s, d).select(col("event_id"), col("props"))
      val corrupt = s.range(1).select(
        lit(-1L).as("event_id"), lit("something that is not json").as("props"))
      ev.unionByName(corrupt)
        .select(col("event_id"),
          from_json(col("props"), org.apache.spark.sql.types.StructType.fromDDL("k INT"))
            .getField("k").as("k"))
        .filter(col("k").isNotNull)
    }),

    // the explicit-schema source DDL path under the oracle gate
    // (reference `DatabaseSelectAndProjectIntTest.java:269-281`): encode
    // documents as a JSON-envelope topic, declare the stream with the
    // reference statement shape, then CSAS off it — the full textual
    // round-trip (to_json → declared-schema decode → ROWKEY → derived
    // stream) must reproduce a plain relational SELECT
    "p15_source_ddl" -> ((s, d) => {
      val reg = new graft.api.StreamRegistry(s)
      reg.registerTopic("docs_topic", Tables.documents(s, d).select(
        encode(to_json(struct(col("doc_id"), col("lang"), col("n_chars"))),
          "UTF-8").as("value")))
      reg.sql("CREATE STREAM docs_ddl (DOC_ID bigint, LANG varchar, N_CHARS bigint) " +
        "WITH (kafka_topic='docs_topic', value_format='JSON', key='doc_id');")
      reg.sql("CREATE STREAM en_docs AS SELECT ROWKEY AS doc_id, LANG AS lang, " +
          "N_CHARS AS n_chars FROM docs_ddl WHERE LANG = 'en';")
        .select("doc_id", "lang", "n_chars")
    }),

    // F4-F9 scalar-function suite: concat joiner (reference valueJoiner
    // `AbstractJoinIntegrationTest.java:118-123`), arithmetic, comparisons,
    // struct construction + field access, cast coercion.
    "f_scalar_suite" -> ((s, d) =>
      Tables.lineitem(s, d).select(
        col("l_orderkey"), col("l_linenumber"),
        concat_ws("-", col("l_returnflag"), col("l_linestatus")).as("flag_status"),
        floor6(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("disc_price"),
        (col("l_quantity") > 25 && col("l_returnflag") === "R").as("big_return"),
        struct(col("l_partkey").as("p"), col("l_suppkey").as("s"))
          .getField("p").as("part_from_struct"),
        col("l_quantity").cast("long").as("qty_long"),
        col("l_orderkey").cast("string").as("key_str"))),

    // A1+A2: group by derived key + count (reference `KafkaWordCount.java:63-64`)
    "a2_count_by_key" -> ((s, d) =>
      Tables.events(s, d).groupBy("event_type")
        .agg(count(lit(1)).as("cnt"), count_distinct(col("user_id")).as("users"))),

    // §2.6 batch-mode sort/limit (beyond reference, free in Spark): top-10
    // orders by exact decimal revenue, deterministic tie-break on key.
    "q3_top_orders" -> ((s, d) =>
      Tables.lineitem(s, d)
        .groupBy("l_orderkey")
        .agg(sum((col("l_extendedprice").cast("decimal(18,2)") *
          (lit(1).cast("decimal(18,2)") - col("l_discount").cast("decimal(18,2)"))))
          .cast("double").as("revenue"))
        .orderBy(col("revenue").desc, col("l_orderkey"))
        .limit(10)),

    // Grouping sets / rollup (beyond reference, free in Spark): counts at
    // (flag, status), (flag), and grand-total levels.
    "g_rollup_counts" -> ((s, d) =>
      Tables.lineitem(s, d)
        .rollup("l_returnflag", "l_linestatus")
        .agg(count(lit(1)).as("cnt"), sum(col("l_quantity")).cast("double").as("sum_qty"))),

    // CUBE: all four grouping levels in one pass (adds the (status)-only
    // level ROLLUP can't express). Quantities are integer-valued doubles,
    // so the sums are exact at any aggregation order.
    "g_cube_counts" -> ((s, d) =>
      Tables.lineitem(s, d)
        .cube("l_returnflag", "l_linestatus")
        .agg(count(lit(1)).as("cnt"), sum(col("l_quantity")).cast("double").as("sum_qty"))),

    // Pivot (wide reshaping): revenue by line status × return flag, the
    // flag domain pinned explicitly so the output schema is static (an
    // inferred pivot would scan once just to discover columns)
    "g_pivot_revenue" -> ((s, d) => {
      val rev = (col("l_extendedprice").cast("decimal(18,2)") *
        (lit(1).cast("decimal(18,2)") - col("l_discount").cast("decimal(18,2)")))
      Tables.lineitem(s, d)
        .groupBy("l_linestatus").pivot("l_returnflag", Seq("A", "N", "R"))
        .agg(sum(rev).cast("double"))
        .select(col("l_linestatus"), col("A").as("rev_a"),
          col("N").as("rev_n"), col("R").as("rev_r"))
    }),

    // Second-moment statistics per group: sample stddev/variance and the
    // value↔time correlation/covariance (mergeable partial aggs — the
    // engine shape for drift monitoring on arbitrarily large groups)
    "stats_moments" -> ((s, d) =>
      Tables.events(s, d).filter(col("value").isNotNull)
        .withColumn("ts_us", expr("ts_ns div 1000"))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"),
          floor6(stddev_samp(col("value"))).as("sd"),
          floor6(var_samp(col("value"))).as("vr"),
          floor6(corr(col("value"), col("ts_us").cast("double"))).as("corr_vt"),
          floor6(covar_samp(col("value"), col("value") * lit(2.0))).as("cov_vv2"))),

    // Time-series resample + forward fill: daily buckets per user between
    // that user's first and last event, gaps carrying the last observation
    "ts_resample_fill" -> ((s, d) =>
      graft.ops.TimeSeries.resampleFill(
        Tables.events(s, d).withColumn("ts_us", expr("ts_ns div 1000")),
        "user_id", "ts_us", "event_id", "value", stepUs = 86400000000L)),

    // Per-group z-score outliers: group stats via one mergeable agg,
    // broadcast back (tiny side table keyed by the group), per-row score —
    // no window over raw events
    "stats_outliers" -> ((s, d) => {
      val ev = Tables.events(s, d).filter(col("value").isNotNull)
      val stats = ev.groupBy("event_type")
        .agg(avg("value").as("mu"), stddev_samp(col("value")).as("sd"))
      ev.join(broadcast(stats), "event_type")
        .withColumn("z", (col("value") - col("mu")) / col("sd"))
        .filter(abs(col("z")) > 2.5)
        .select(col("event_type"), col("event_id"), floor6(col("z")).as("z"))
    }),

    // 7-day trailing moving average over the resampled/forward-filled grid
    "ts_moving_avg" -> ((s, d) => {
      val filled = graft.ops.TimeSeries.resampleFill(
        Tables.events(s, d).withColumn("ts_us", expr("ts_ns div 1000")),
        "user_id", "ts_us", "event_id", "value", stepUs = 86400000000L)
      graft.ops.TimeSeries.movingAvg(filled, "user_id", "bucket", "filled", width = 7)
        .select(col("user_id"), col("bucket"), floor6(col("ma")).as("ma"))
    }),

    // Width-8 truncated EWMA (decay 1/2) over the same daily grid —
    // ENGINE-EXACT: cent-quantized values, power-of-two literal weight
    // table, truncating integer division; one key exchange, O(width)
    // frame state
    "ts_ewma" -> ((s, d) => {
      val filled = graft.ops.TimeSeries.resampleFill(
        Tables.events(s, d).withColumn("ts_us", expr("ts_ns div 1000")),
        "user_id", "ts_us", "event_id", "value", stepUs = 86400000000L)
      graft.ops.TimeSeries.ewma(filled, "user_id", "bucket", "filled",
        width = 8, decayNum = 1, decayDen = 2)
        .select(col("user_id"), col("bucket"), col("ewma_cents"))
    }),

    // Two-sample chi-square drift between corpus snapshots (even vs odd
    // event ids — two independent draws from the same generator, so the
    // statistic reports NO drift at any scale factor, which is itself the
    // oracle-checked claim); fixed 32×5.00 grid from 0, outliers clamped
    // into the edge bins. Exact integer chi-square terms in micro units.
    "drift_chi2" -> ((s, d) => {
      val ev = Tables.events(s, d)
      graft.ops.Stats.chiSquareDrift(
        ev.filter(pmod(col("event_id"), lit(2)) === 0),
        ev.filter(pmod(col("event_id"), lit(2)) === 1),
        "value", loCents = 0L, widthCents = 500L, buckets = 32)
    }),

    // trending properties: per day, the top-3 values of the JSON `k`
    // property by count (S5-style source-side parse feeding the windowed
    // top-N — the trending-topics shape; per-day partitions are bounded
    // by the k domain, not the event count)
    "ts_trending_props" -> ((s, d) =>
      graft.ops.TimeSeries.trendingTopN(
        Tables.events(s, d).withColumn("ts_us", expr("ts_ns div 1000")),
        "ts_us", get_json_object(col("props"), "$.k").cast("long"),
        stepUs = 86400000000L, n = 3)),

    // gap-based sessionization: >2h of silence starts a new session
    "ts_sessionize" -> ((s, d) =>
      graft.ops.TimeSeries.sessionize(
        Tables.events(s, d).withColumn("ts_us", expr("ts_ns div 1000")),
        "user_id", "ts_us", "event_id", gapUs = 7200000000L)
        .select(col("user_id"), col("event_id"), col("session_id"))),

    // Two-sided CUSUM mean-shift detection per user: cent-quantized,
    // closed-form (prefix sum − running min) — two cumulative windows on
    // one key exchange, no sequential fold. target 50.00, slack 5.00,
    // h 500.00 keeps both shift directions live at the gate scale
    // (342 up / 71 down at sf0.01)
    "ts_cusum" -> ((s, d) =>
      graft.ops.TimeSeries.cusum(
        Tables.events(s, d).filter(col("value").isNotNull)
          .withColumn("ts_us", expr("ts_ns div 1000")),
        "user_id", "ts_us", "event_id", "value",
        targetCents = 5000L, slackCents = 500L, hCents = 50000L)
        .select(col("user_id"), col("event_id"), col("cusum_pos"),
          col("cusum_neg"), col("shift_up"), col("shift_down"))),

    // Cohort retention: users bucketed by first-activity day; per (cohort,
    // day offset) exact distinct active users — one user-keyed shuffle
    "ts_cohort_retention" -> ((s, d) =>
      graft.ops.TimeSeries.cohortRetention(
        Tables.events(s, d).withColumn("ts_us", expr("ts_ns div 1000")),
        "user_id", "ts_us", stepUs = 86400000000L)),

    // Rolling z-score anomalies in EXACT integer arithmetic: cent-quantized
    // values, trailing 8-event frame per user, 3-sigma flag via the
    // denominator-cleared inequality (n·x−s)² > k²(n·s2−s²) — no float
    // stddev, so both engines make identical calls at the boundary
    "ts_anomaly" -> ((s, d) =>
      graft.ops.TimeSeries.rollingAnomalies(
        Tables.events(s, d).filter(col("value").isNotNull)
          .withColumn("ts_us", expr("ts_ns div 1000")),
        "user_id", "ts_us", "event_id", "value", width = 8, k = 3)
        .select(col("user_id"), col("event_id"), col("anomaly"), col("hist_n"))),

    // KTable materialization (A3 batch twin): the latest record per key —
    // the table snapshot a changelog compacts to.
    "a3_latest_per_key" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      // order and emit at µs precision: DuckDB truncates the nanos
      // timestamp to µs on read, so ns-precision ordering would diverge
      val w = Window.partitionBy("user_id").orderBy(col("ts_us").desc, col("event_id").desc)
      Tables.events(s, d)
        .withColumn("ts_us", expr("ts_ns div 1000"))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("user_id"), col("event_id").as("last_event_id"),
          col("event_type").as("last_type"), col("ts_us").as("last_ts_us"))
    }),

    // SCD type-2 materialization (A3's history-keeping sibling): the per-
    // key changelog becomes validity intervals [valid_from, valid_to) with
    // an is_current flag — one key-partitioned window, no global order.
    "cdc_scd2" -> ((s, d) =>
      graft.ops.Cdc.scd2(
        Tables.events(s, d).withColumn("ts_us", expr("ts_ns div 1000"))
          .select(col("user_id"), col("event_id"), col("event_type"), col("ts_us")),
        "user_id", "ts_us", "event_id")
        .select(col("user_id"), col("event_id"), col("event_type"),
          col("valid_from"), col("valid_to"), col("is_current"))),

    // Exact percentiles via an EXPLICIT interpolation both engines compute
    // with the same IEEE op sequence (lo + frac*(hi-lo) over the sorted
    // list) — relying on percentile()/quantile_cont() being bit-identical
    // would make floor6 a data-dependent flake at x*1e6 integer boundaries
    "stats_percentiles" -> ((s, d) => {
      def pct(p: Double): Column = {
        val idx = (size(col("arr")).cast("double") - 1.0) * lit(p)
        val loV = element_at(col("arr"), floor(idx).cast("int") + 1)
        val hiV = element_at(col("arr"), ceil(idx).cast("int") + 1)
        loV + (idx - floor(idx)) * (hiV - loV)
      }
      // NULL values filtered explicitly: Spark's collect_list drops them
      // while DuckDB's list() keeps them — without the filter the arrays
      // diverge the moment the data has a null
      Tables.events(s, d).filter(col("value").isNotNull)
        .groupBy("event_type")
        .agg(sort_array(collect_list(col("value"))).as("arr"),
          floor6(min(col("value"))).as("vmin"),
          floor6(max(col("value"))).as("vmax"))
        .select(col("event_type"),
          floor6(pct(0.5)).as("p50"), floor6(pct(0.95)).as("p95"),
          col("vmin"), col("vmax"))
    }),

    // The SCALE path for percentiles (see ops.Stats): fixed-B histogram +
    // within-bucket interpolation — every agg partial/mergeable, reducer
    // state ≤ B longs, no collect_list (PlanSpec-guarded). The estimator is
    // deterministic arithmetic over (min, width, counts), so DuckDB
    // reproduces it bit-for-bit.
    "stats_percentiles_hist" -> ((s, d) =>
      graft.ops.Stats.histogramPercentiles(
        Tables.events(s, d), "event_type", "value",
        Seq(("50", 0.5), ("95", 0.95)), buckets = 256)),

    // top-decile selection per class rides the SAME mergeable histogram
    // threshold (no per-class sort at any scale)
    "sample_top_frac" -> ((s, d) =>
      graft.ops.Sampling.topFracByClass(
        Tables.events(s, d).select("event_id", "event_type", "value"),
        "event_type", "value", frac = 0.1)),

    // Value histogram: fixed-width buckets, exact counts
    "stats_histogram" -> ((s, d) =>
      Tables.events(s, d)
        .groupBy(col("event_type"), (floor(col("value") / 25) * 25).cast("long").as("bucket"))
        .agg(count(lit(1)).as("cnt"))),

    // Analytic window functions (beyond reference): top-2 orders per
    // customer by price, deterministic tie-break.
    "q_top2_per_customer" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("o_custkey")
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      Tables.orders(s, d)
        .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"))
        .withColumn("rnk", row_number().over(w))
        .filter(col("rnk") <= 2)
    }),

    // Event funnel: first click per user, then first purchase at-or-after it
    "a_funnel_conversion" -> ((s, d) => {
      val e = Tables.events(s, d).withColumn("ts_us", expr("ts_ns div 1000"))
      val clicks = e.filter(col("event_type") === "click")
        .groupBy("user_id").agg(min(col("ts_us")).as("first_click_us"))
      val purchases = e.filter(col("event_type") === "purchase")
        .select(col("user_id").as("p_user"), col("ts_us").as("pts"))
      clicks.join(purchases,
          col("user_id") === col("p_user") && col("pts") >= col("first_click_us"), "left")
        .groupBy("user_id", "first_click_us")
        .agg(min(col("pts")).as("first_purchase_us"))
        .select(col("user_id"), col("first_click_us"), col("first_purchase_us"),
          col("first_purchase_us").isNotNull.as("converted"))
    }),

    // Headline: TPC-H Q1-shaped pricing summary. Money sums go through
    // DECIMAL(18,2) so the result is order-of-summation independent (exact
    // decimal arithmetic) — the double sum would be nondeterministic across
    // partition orders and engines.
    "q1_pricing_summary" -> ((s, d) =>
      Tables.lineitem(s, d)
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          sum(col("l_quantity")).cast("double").as("sum_qty"),
          sum(col("l_extendedprice").cast("decimal(18,2)")).cast("double").as("sum_base_price"),
          sum((col("l_extendedprice").cast("decimal(18,2)") *
            (lit(1).cast("decimal(18,2)") - col("l_discount").cast("decimal(18,2)"))))
            .cast("double").as("sum_disc_price"),
          count(lit(1)).as("count_order"))))

  val oracle: Map[String, String] = Map(
    "p1_map_rekey" ->
      """SELECT 'u' || user_id AS new_key, "value" * 2 AS doubled, event_id FROM events""",

    "p3_flatmap_records" ->
      """SELECT event_id, 'type' AS tag, event_type AS v FROM events
        |UNION ALL
        |SELECT event_id, 'user' AS tag, user_id::VARCHAR AS v FROM events""".stripMargin,

    "p5_projection" ->
      "SELECT o_orderkey, o_totalprice, o_orderpriority FROM orders",

    "p6_select_star" ->
      """SELECT *, o_orderkey AS ROWKEY, epoch_ms(o_orderdate) AS ROWTIME FROM orders""",

    "p7_alias_arith_filter" ->
      """SELECT o_orderkey AS RKEY, epoch_ms(o_orderdate) + 10000 AS RTIME, o_orderpriority
        |FROM orders WHERE o_totalprice > 150000 AND o_orderstatus = 'F'""".stripMargin,

    "p10_filter" ->
      """SELECT *, o_orderkey AS ROWKEY, epoch_ms(o_orderdate) AS ROWTIME
        |FROM orders WHERE o_totalprice > 100000""".stripMargin,

    "p12_timestamp_reassign" ->
      """SELECT o_orderkey AS ROWKEY, epoch_ms(o_orderdate) + 10000 AS RTIME,
        |       epoch_ms(o_orderdate) + 10000 AS ROWTIME
        |FROM orders""".stripMargin,

    "p15_source_ddl" ->
      """SELECT doc_id, lang, n_chars FROM documents WHERE lang = 'en'""",

    "p13_bad_records" ->
      """SELECT event_id, json_extract(props, 'k')::INT AS k FROM events
        |WHERE json_valid(props) AND json_extract(props, 'k') IS NOT NULL""".stripMargin,

    "f_scalar_suite" ->
      """SELECT l_orderkey, l_linenumber,
        |  l_returnflag || '-' || l_linestatus AS flag_status,
        |  floor((l_extendedprice * (1 - l_discount)) * 1000000) / 1000000.0 AS disc_price,
        |  (l_quantity > 25 AND l_returnflag = 'R') AS big_return,
        |  l_partkey AS part_from_struct,
        |  l_quantity::BIGINT AS qty_long,
        |  l_orderkey::VARCHAR AS key_str
        |FROM lineitem""".stripMargin,

    "a2_count_by_key" ->
      """SELECT event_type, count(*) AS cnt, count(DISTINCT user_id) AS users
        |FROM events GROUP BY event_type""".stripMargin,

    "ts_resample_fill" ->
      """WITH o AS (SELECT user_id, epoch_us(ts) // 86400000000 AS bucket,
        |                  epoch_us(ts) AS tus, event_id, value
        |           FROM events WHERE value IS NOT NULL),
        |lastv AS (SELECT user_id, bucket, value AS obs_v FROM (
        |            SELECT user_id, bucket, value,
        |                   row_number() OVER (PARTITION BY user_id, bucket
        |                                      ORDER BY tus DESC, event_id DESC) AS rn
        |            FROM o) WHERE rn = 1),
        |g AS (SELECT user_id, unnest(range(b0, b1 + 1)) AS bucket
        |      FROM (SELECT user_id, min(bucket) AS b0, max(bucket) AS b1
        |            FROM o GROUP BY user_id))
        |SELECT g.user_id, g.bucket,
        |       last_value(lv.obs_v IGNORE NULLS)
        |         OVER (PARTITION BY g.user_id ORDER BY g.bucket
        |               ROWS UNBOUNDED PRECEDING) AS filled,
        |       lv.obs_v IS NOT NULL AS observed
        |FROM g LEFT JOIN lastv lv ON lv.user_id = g.user_id AND lv.bucket = g.bucket""".stripMargin,

    "stats_outliers" ->
      """WITH st AS (SELECT event_type, avg(value) AS mu, stddev_samp(value) AS sd
        |            FROM events WHERE value IS NOT NULL GROUP BY event_type)
        |SELECT e.event_type, e.event_id,
        |       floor(((e.value - st.mu) / st.sd) * 1000000) / 1000000.0 AS z
        |FROM events e JOIN st USING (event_type)
        |WHERE e.value IS NOT NULL AND abs((e.value - st.mu) / st.sd) > 2.5""".stripMargin,

    "ts_moving_avg" ->
      """WITH o AS (SELECT user_id, epoch_us(ts) // 86400000000 AS bucket,
        |                  epoch_us(ts) AS tus, event_id, value
        |           FROM events WHERE value IS NOT NULL),
        |lastv AS (SELECT user_id, bucket, value AS obs_v FROM (
        |            SELECT user_id, bucket, value,
        |                   row_number() OVER (PARTITION BY user_id, bucket
        |                                      ORDER BY tus DESC, event_id DESC) AS rn
        |            FROM o) WHERE rn = 1),
        |g AS (SELECT user_id, unnest(range(b0, b1 + 1)) AS bucket
        |      FROM (SELECT user_id, min(bucket) AS b0, max(bucket) AS b1
        |            FROM o GROUP BY user_id)),
        |f AS (SELECT g.user_id, g.bucket,
        |             last_value(lv.obs_v IGNORE NULLS)
        |               OVER (PARTITION BY g.user_id ORDER BY g.bucket
        |                     ROWS UNBOUNDED PRECEDING) AS filled
        |      FROM g LEFT JOIN lastv lv ON lv.user_id = g.user_id AND lv.bucket = g.bucket)
        |SELECT user_id, bucket,
        |       floor(avg(filled) OVER (PARTITION BY user_id ORDER BY bucket
        |                               ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
        |             * 1000000) / 1000000.0 AS ma
        |FROM f""".stripMargin,

    // same resample/fill chain as ts_moving_avg, then the identical
    // integer-weight fold: cent-quantized values, power-of-two weight
    // literals, truncating // division — bit-for-bit with the Spark op
    "ts_ewma" ->
      """WITH o AS (SELECT user_id, epoch_us(ts) // 86400000000 AS bucket,
        |                  epoch_us(ts) AS tus, event_id, value
        |           FROM events WHERE value IS NOT NULL),
        |lastv AS (SELECT user_id, bucket, value AS obs_v FROM (
        |            SELECT user_id, bucket, value,
        |                   row_number() OVER (PARTITION BY user_id, bucket
        |                                      ORDER BY tus DESC, event_id DESC) AS rn
        |            FROM o) WHERE rn = 1),
        |g AS (SELECT user_id, unnest(range(b0, b1 + 1)) AS bucket
        |      FROM (SELECT user_id, min(bucket) AS b0, max(bucket) AS b1
        |            FROM o GROUP BY user_id)),
        |f AS (SELECT g.user_id, g.bucket,
        |             last_value(lv.obs_v IGNORE NULLS)
        |               OVER (PARTITION BY g.user_id ORDER BY g.bucket
        |                     ROWS UNBOUNDED PRECEDING) AS filled
        |      FROM g LEFT JOIN lastv lv ON lv.user_id = g.user_id AND lv.bucket = g.bucket),
        |e AS (SELECT user_id, bucket, floor(filled * 100)::BIGINT AS cents FROM f),
        |wl AS (SELECT user_id, bucket,
        |         list_sort(list(struct_pack(b := bucket, x := cents))
        |           OVER (PARTITION BY user_id ORDER BY bucket
        |                 ROWS BETWEEN 7 PRECEDING AND CURRENT ROW)) AS l
        |       FROM e)
        |SELECT user_id, bucket,
        |  (list_sum(list_transform(range(len(l)),
        |     i -> [128,64,32,16,8,4,2,1][len(l)-i] * l[i+1]['x']))
        |   // list_sum(list_transform(range(len(l)),
        |     i -> [128,64,32,16,8,4,2,1][len(l)-i])))::BIGINT AS ewma_cents
        |FROM wl""".stripMargin,

    // every product ridden through HUGEINT exactly as the Spark side rides
    // DECIMAL(38,0); // is truncating division on both engines
    "drift_chi2" ->
      """WITH ba AS (SELECT least(greatest((floor(value*100)::BIGINT - 0) // 500, 0), 31) AS bin
        |            FROM events WHERE event_id % 2 = 0 AND value IS NOT NULL),
        |bb AS (SELECT least(greatest((floor(value*100)::BIGINT - 0) // 500, 0), 31) AS bin
        |       FROM events WHERE event_id % 2 = 1 AND value IS NOT NULL),
        |ca AS (SELECT bin, count(*)::BIGINT AS cnt_a FROM ba GROUP BY bin),
        |cb AS (SELECT bin, count(*)::BIGINT AS cnt_b FROM bb GROUP BY bin),
        |j AS (SELECT bin, coalesce(cnt_a, 0)::BIGINT AS cnt_a, coalesce(cnt_b, 0)::BIGINT AS cnt_b
        |      FROM ca FULL JOIN cb USING (bin)),
        |t AS (SELECT sum(cnt_a)::BIGINT AS na, sum(cnt_b)::BIGINT AS nb FROM j)
        |SELECT bin, cnt_a, cnt_b,
        |  CASE WHEN na > 0 AND nb > 0 THEN
        |    ((1000000::HUGEINT * (cnt_a::HUGEINT * nb - cnt_b::HUGEINT * na)
        |                       * (cnt_a::HUGEINT * nb - cnt_b::HUGEINT * na))
        |      // ((cnt_a + cnt_b)::HUGEINT * na * nb))::BIGINT
        |  ELSE 0 END AS chi2_term_micro
        |FROM j CROSS JOIN t""".stripMargin,

    "ts_trending_props" ->
      """WITH b AS (SELECT epoch_us(ts) // 86400000000 AS bucket,
        |            json_extract(props, '$.k')::BIGINT AS item
        |           FROM events WHERE json_extract(props, '$.k') IS NOT NULL),
        |g AS (SELECT bucket, item, count(*)::BIGINT AS cnt FROM b GROUP BY 1, 2)
        |SELECT bucket, item, cnt,
        |       row_number() OVER (PARTITION BY bucket
        |         ORDER BY cnt DESC, item ASC)::BIGINT AS rnk
        |FROM g QUALIFY rnk <= 3""".stripMargin,

    "ts_sessionize" ->
      """WITH o AS (SELECT user_id, event_id, epoch_us(ts) AS tus FROM events),
        |b AS (SELECT user_id, event_id, tus,
        |             CASE WHEN lag(tus) OVER w IS NULL
        |                    OR tus - lag(tus) OVER w > 7200000000 THEN 1 ELSE 0 END AS brk
        |      FROM o WINDOW w AS (PARTITION BY user_id ORDER BY tus, event_id))
        |SELECT user_id, event_id,
        |       (sum(brk) OVER (PARTITION BY user_id ORDER BY tus, event_id
        |                       ROWS UNBOUNDED PRECEDING) - 1)::BIGINT AS session_id
        |FROM b""".stripMargin,

    "ts_cusum" ->
      """WITH q AS (SELECT user_id, event_id, epoch_us(ts) AS tus,
        |                  floor("value" * 100)::BIGINT AS xq
        |           FROM events WHERE "value" IS NOT NULL),
        |c AS (SELECT user_id, event_id, tus,
        |         sum(xq - 5500) OVER w AS p,
        |         sum(xq - 4500) OVER w AS e
        |      FROM q WINDOW w AS (PARTITION BY user_id ORDER BY tus, event_id
        |                          ROWS UNBOUNDED PRECEDING))
        |SELECT user_id, event_id,
        |       (p - least(min(p) OVER w2, 0))::BIGINT AS cusum_pos,
        |       (greatest(max(e) OVER w2, 0) - e)::BIGINT AS cusum_neg,
        |       (p - least(min(p) OVER w2, 0)) > 50000 AS shift_up,
        |       (greatest(max(e) OVER w2, 0) - e) > 50000 AS shift_down
        |FROM c WINDOW w2 AS (PARTITION BY user_id ORDER BY tus, event_id
        |                     ROWS UNBOUNDED PRECEDING)""".stripMargin,

    "ts_cohort_retention" ->
      """WITH ub AS (SELECT DISTINCT user_id, epoch_us(ts) // 86400000000 AS bucket
        |            FROM events),
        |c AS (SELECT user_id, bucket,
        |             min(bucket) OVER (PARTITION BY user_id) AS cohort
        |      FROM ub)
        |SELECT cohort, bucket - cohort AS period, count(*) AS active_users
        |FROM c GROUP BY 1, 2""".stripMargin,

    // same cent quantization, same trailing frame, same denominator-cleared
    // integer inequality — sum(BIGINT) is HUGEINT in DuckDB, so the products
    // are exact there just as the longs are on the Spark side
    "ts_anomaly" ->
      """WITH q AS (SELECT user_id, event_id, epoch_us(ts) AS tus,
        |                  floor("value" * 100)::BIGINT AS xq
        |           FROM events WHERE "value" IS NOT NULL),
        |w AS (SELECT user_id, event_id, xq,
        |             count(xq) OVER win AS n,
        |             sum(xq) OVER win AS s,
        |             sum(xq * xq) OVER win AS s2
        |      FROM q WINDOW win AS (PARTITION BY user_id ORDER BY tus, event_id
        |                            ROWS BETWEEN 8 PRECEDING AND 1 PRECEDING))
        |SELECT user_id, event_id,
        |       n = 8 AND (8 * xq - s) * (8 * xq - s) > 9 * (8 * s2 - s * s) AS anomaly,
        |       n::BIGINT AS hist_n
        |FROM w""".stripMargin,

    "a3_latest_per_key" ->
      """SELECT user_id, event_id AS last_event_id, event_type AS last_type,
        |       epoch_us(ts) AS last_ts_us
        |FROM (SELECT *, row_number() OVER (PARTITION BY user_id
        |                                   ORDER BY ts DESC, event_id DESC) AS rn
        |      FROM events)
        |WHERE rn = 1""".stripMargin,

    "cdc_scd2" ->
      """SELECT user_id, event_id, event_type,
        |       epoch_us(ts) AS valid_from,
        |       lead(epoch_us(ts)) OVER (PARTITION BY user_id
        |                                ORDER BY epoch_us(ts), event_id) AS valid_to,
        |       lead(epoch_us(ts)) OVER (PARTITION BY user_id
        |                                ORDER BY epoch_us(ts), event_id) IS NULL AS is_current
        |FROM events""".stripMargin,

    // identical explicit interpolation as the Spark side: idx=(n-1)*p,
    // lo + (idx-floor(idx))*(hi-lo) over the sorted list
    "stats_percentiles" ->
      """WITH g AS (
        |  SELECT event_type, list_sort(list("value")) AS arr,
        |         min("value") AS mn, max("value") AS mx
        |  FROM events WHERE "value" IS NOT NULL GROUP BY event_type),
        |p AS (
        |  SELECT event_type, arr, mn, mx,
        |         (len(arr) - 1)::DOUBLE * 0.5::DOUBLE AS i50,
        |         (len(arr) - 1)::DOUBLE * 0.95::DOUBLE AS i95
        |  FROM g)
        |SELECT event_type,
        |  floor((arr[floor(i50)::BIGINT + 1]
        |         + (i50 - floor(i50)) * (arr[ceil(i50)::BIGINT + 1] - arr[floor(i50)::BIGINT + 1]))
        |        * 1000000) / 1000000.0 AS p50,
        |  floor((arr[floor(i95)::BIGINT + 1]
        |         + (i95 - floor(i95)) * (arr[ceil(i95)::BIGINT + 1] - arr[floor(i95)::BIGINT + 1]))
        |        * 1000000) / 1000000.0 AS p95,
        |  floor(mn * 1000000) / 1000000.0 AS vmin,
        |  floor(mx * 1000000) / 1000000.0 AS vmax
        |FROM p""".stripMargin,

    // identical estimator arithmetic as ops.Stats.histogramPercentiles:
    // w=(mx-mn)/256, b=least(floor((v-mn)/w),255), t=p*n,
    // est = mn + w*(b + (t-below)/cnt) in the first bucket with cum >= t
    "sample_top_frac" ->
      """WITH r AS (SELECT event_type, "value" AS v FROM events WHERE "value" IS NOT NULL),
        |s AS (SELECT event_type, count(*)::BIGINT AS n, min(v) AS mn, max(v) AS mx,
        |             (max(v) - min(v)) / 256.0 AS w
        |      FROM r GROUP BY event_type),
        |h AS (SELECT r.event_type,
        |             CASE WHEN s.w = 0 THEN 0
        |                  ELSE least(floor((r.v - s.mn) / s.w)::BIGINT, 255) END AS b,
        |             count(*)::BIGINT AS cnt
        |      FROM r JOIN s USING (event_type) GROUP BY 1, 2),
        |c AS (SELECT h.*, sum(h.cnt) OVER (PARTITION BY h.event_type ORDER BY h.b
        |             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)::BIGINT AS cum
        |      FROM h),
        |sel AS (
        |  SELECT c.event_type,
        |         floor((CASE WHEN s.w = 0 THEN s.mn
        |                ELSE s.mn + s.w * (c.b::DOUBLE +
        |                     (0.9 * s.n::DOUBLE - (c.cum - c.cnt)::DOUBLE) / c.cnt::DOUBLE)
        |                END) * 1000000) / 1000000.0 AS p_cut
        |  FROM c JOIN s USING (event_type)
        |  WHERE c.cum::DOUBLE >= 0.9 * s.n::DOUBLE
        |  QUALIFY row_number() OVER (PARTITION BY c.event_type ORDER BY c.b) = 1)
        |SELECT e.event_type, e.event_id, e."value"
        |FROM events e JOIN sel USING (event_type)
        |WHERE e."value" >= sel.p_cut""".stripMargin,

    "stats_percentiles_hist" ->
      """WITH r AS (SELECT event_type, "value" AS v FROM events WHERE "value" IS NOT NULL),
        |s AS (SELECT event_type, count(*)::BIGINT AS n, min(v) AS mn, max(v) AS mx,
        |             (max(v) - min(v)) / 256.0 AS w
        |      FROM r GROUP BY event_type),
        |h AS (SELECT r.event_type,
        |             CASE WHEN s.w = 0 THEN 0
        |                  ELSE least(floor((r.v - s.mn) / s.w)::BIGINT, 255) END AS b,
        |             count(*)::BIGINT AS cnt
        |      FROM r JOIN s USING (event_type) GROUP BY 1, 2),
        |c AS (SELECT h.*, sum(h.cnt) OVER (PARTITION BY h.event_type ORDER BY h.b
        |             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)::BIGINT AS cum
        |      FROM h),
        |sel50 AS (
        |  SELECT c.event_type,
        |         floor((CASE WHEN s.w = 0 THEN s.mn
        |                ELSE s.mn + s.w * (c.b::DOUBLE +
        |                     (0.5 * s.n::DOUBLE - (c.cum - c.cnt)::DOUBLE) / c.cnt::DOUBLE)
        |                END) * 1000000) / 1000000.0 AS p_50
        |  FROM c JOIN s USING (event_type)
        |  WHERE c.cum::DOUBLE >= 0.5 * s.n::DOUBLE
        |  QUALIFY row_number() OVER (PARTITION BY c.event_type ORDER BY c.b) = 1),
        |sel95 AS (
        |  SELECT c.event_type,
        |         floor((CASE WHEN s.w = 0 THEN s.mn
        |                ELSE s.mn + s.w * (c.b::DOUBLE +
        |                     (0.95 * s.n::DOUBLE - (c.cum - c.cnt)::DOUBLE) / c.cnt::DOUBLE)
        |                END) * 1000000) / 1000000.0 AS p_95
        |  FROM c JOIN s USING (event_type)
        |  WHERE c.cum::DOUBLE >= 0.95 * s.n::DOUBLE
        |  QUALIFY row_number() OVER (PARTITION BY c.event_type ORDER BY c.b) = 1)
        |SELECT sel50.event_type, sel50.p_50, sel95.p_95
        |FROM sel50 JOIN sel95 USING (event_type)""".stripMargin,

    "stats_histogram" ->
      """SELECT event_type, (floor("value" / 25) * 25)::BIGINT AS bucket, count(*) AS cnt
        |FROM events GROUP BY 1, 2""".stripMargin,

    "q_top2_per_customer" ->
      """SELECT * FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |         row_number() OVER (PARTITION BY o_custkey
        |                            ORDER BY o_totalprice DESC, o_orderkey) AS rnk
        |  FROM orders)
        |WHERE rnk <= 2""".stripMargin,

    "a_funnel_conversion" ->
      """WITH c AS (
        |  SELECT user_id, min(epoch_us(ts)) AS first_click_us
        |  FROM events WHERE event_type = 'click' GROUP BY user_id),
        |j AS (
        |  SELECT c.user_id, c.first_click_us, min(epoch_us(p.ts)) AS first_purchase_us
        |  FROM c LEFT JOIN events p
        |    ON p.user_id = c.user_id AND p.event_type = 'purchase'
        |   AND epoch_us(p.ts) >= c.first_click_us
        |  GROUP BY c.user_id, c.first_click_us)
        |SELECT user_id, first_click_us, first_purchase_us,
        |       (first_purchase_us IS NOT NULL) AS converted
        |FROM j""".stripMargin,

    "q3_top_orders" ->
      """SELECT l_orderkey,
        |  sum(l_extendedprice::DECIMAL(18,2) * (1::DECIMAL(18,2) - l_discount::DECIMAL(18,2)))::DOUBLE AS revenue
        |FROM lineitem GROUP BY l_orderkey
        |ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin,

    "g_rollup_counts" ->
      """SELECT l_returnflag, l_linestatus, count(*) AS cnt, sum(l_quantity)::DOUBLE AS sum_qty
        |FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)""".stripMargin,

    "g_cube_counts" ->
      """SELECT l_returnflag, l_linestatus, count(*) AS cnt, sum(l_quantity)::DOUBLE AS sum_qty
        |FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)""".stripMargin,

    "g_pivot_revenue" -> {
      def rev(flag: String): String =
        s"""sum(CASE WHEN l_returnflag = '$flag'
           |    THEN l_extendedprice::DECIMAL(18,2) * (1::DECIMAL(18,2) - l_discount::DECIMAL(18,2))
           |    END)::DOUBLE""".stripMargin
      s"""SELECT l_linestatus, ${rev("A")} AS rev_a, ${rev("N")} AS rev_n,
         |  ${rev("R")} AS rev_r
         |FROM lineitem GROUP BY l_linestatus""".stripMargin
    },

    "stats_moments" ->
      """SELECT event_type, count(*) AS n,
        |  floor(stddev_samp(value) * 1000000) / 1000000.0 AS sd,
        |  floor(var_samp(value) * 1000000) / 1000000.0 AS vr,
        |  floor(corr(value, epoch_us(ts)::DOUBLE) * 1000000) / 1000000.0 AS corr_vt,
        |  floor(covar_samp(value, value * 2.0) * 1000000) / 1000000.0 AS cov_vv2
        |FROM events WHERE value IS NOT NULL
        |GROUP BY event_type""".stripMargin,

    "q1_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        |  sum(l_quantity)::DOUBLE AS sum_qty,
        |  sum(l_extendedprice::DECIMAL(18,2))::DOUBLE AS sum_base_price,
        |  sum(l_extendedprice::DECIMAL(18,2) * (1::DECIMAL(18,2) - l_discount::DECIMAL(18,2)))::DOUBLE AS sum_disc_price,
        |  count(*) AS count_order
        |FROM lineitem GROUP BY l_returnflag, l_linestatus""".stripMargin)
}
