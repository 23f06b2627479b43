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

  /** TPC-H Q21 oracle text — shared by the semi+anti structural form and
    * the aggregate-decorrelated twin (one truth, two physical strategies).
    */
  private val q21Sql =
    """SELECT s_name, count(*) AS numwait
      |FROM lineitem l1
      |JOIN orders ON o_orderkey = l1.l_orderkey
      |JOIN supplier ON s_suppkey = l1.l_suppkey
      |WHERE o_orderstatus = 'F'
      |  AND l1.l_shipdate > o_orderdate + INTERVAL 90 DAY
      |  AND EXISTS (SELECT 1 FROM lineitem l2
      |              WHERE l2.l_orderkey = l1.l_orderkey
      |                AND l2.l_suppkey <> l1.l_suppkey)
      |  AND NOT EXISTS (SELECT 1 FROM lineitem l3
      |                  WHERE l3.l_orderkey = l1.l_orderkey
      |                    AND l3.l_suppkey <> l1.l_suppkey
      |                    AND l3.l_shipdate > o_orderdate + INTERVAL 90 DAY)
      |GROUP BY s_name""".stripMargin

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

    // Temporal AS-OF join (KTable-lookup semantics, batch twin): each
    // purchase joins the user's most recent view at-or-before it; users
    // with no prior view keep nulls. Oracle = DuckDB's native ASOF JOIN.
    "j_asof" -> ((s, d) => {
      val e = ev(s, d)
      val p = e.filter(col("event_type") === "purchase")
        .select(col("event_id").as("p_id"), col("user_id"), col("ts_us").as("ets"))
      val v = e.filter(col("event_type") === "view")
        .select(col("user_id"), col("ts_us").as("vts"),
          col("event_id").as("v_id"), col("value").as("v_value"))
      graft.ops.AsOf.asOfJoin(p, v, "user_id", "ets", "vts")
    }),

    // the HIGH-CHURN scale path for the same lookup: union + one keyed
    // window instead of join-then-reduce — no per-version fan-out in any
    // shuffle (AsOfSpec pins equality + the 1-exchange/no-join plan).
    // Same oracle as j_asof: the two forms are exact twins.
    "j_asof_compact" -> ((s, d) => {
      val e = ev(s, d)
      val p = e.filter(col("event_type") === "purchase")
        .select(col("event_id").as("p_id"), col("user_id"), col("ts_us").as("ets"))
      val v = e.filter(col("event_type") === "view")
        .select(col("user_id"), col("ts_us").as("vts"),
          col("event_id").as("v_id"), col("value").as("v_value"))
      graft.ops.AsOf.asOfJoinCompact(p, v, "user_id", "ets", "vts")
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

    // TPC-H Q5-shaped join chain: region → nation → supplier dims broadcast,
    // customer⋈orders⋈lineitem facts shuffle — revenue per nation in ASIA.
    "q5_local_supplier" -> ((s, d) => {
      val li = Tables.lineitem(s, d)
      val o = Tables.orders(s, d)
      val c = Tables.customer(s, d)
      val su = Tables.supplier(s, d)
      val n = Tables.nation(s, d)
      val r = Tables.region(s, d).filter(col("r_name") === "ASIA")
      li.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(c, col("o_custkey") === col("c_custkey"))
        .join(broadcast(su), col("l_suppkey") === col("s_suppkey") &&
          col("c_nationkey") === col("s_nationkey"))
        .join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
        .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
        .groupBy("n_name")
        .agg(sum((col("l_extendedprice").cast("decimal(18,2)") *
          (lit(1).cast("decimal(18,2)") - col("l_discount").cast("decimal(18,2)"))))
          .cast("double").as("revenue"))
    }),

    // TPC-H Q6-shaped forecast revenue: pure scan + pushed filters + agg —
    // the pushdown shape (date range, discount band, qty cap reach the scan).
    "q6_forecast_revenue" -> ((s, d) =>
      Tables.lineitem(s, d)
        .filter(col("l_shipdate") >= lit("1996-01-01") &&
          col("l_shipdate") < lit("1997-01-01") &&
          col("l_discount") >= 0.03 && col("l_discount") <= 0.07 &&
          col("l_quantity") < 24)
        .agg(sum((col("l_extendedprice").cast("decimal(18,2)") *
          col("l_discount").cast("decimal(18,2)"))).cast("double").as("revenue"),
          count(lit(1)).as("n"))),

    // TPC-H Q14-shaped promo revenue: conditional aggregation (CASE inside
    // the sum) over a broadcast dimension join — the part dim broadcasts,
    // only lineitem shuffles into the single global agg.
    "q14_promo_revenue" -> ((s, d) => {
      val li = Tables.lineitem(s, d)
        .filter(col("l_shipdate") >= lit("1996-01-01") &&
          col("l_shipdate") < lit("1996-04-01"))
      val p = Tables.part(s, d)
      val disc = col("l_extendedprice").cast("decimal(18,2)") *
        (lit(1).cast("decimal(18,2)") - col("l_discount").cast("decimal(18,2)"))
      li.join(broadcast(p), col("l_partkey") === col("p_partkey"))
        .agg(
          sum(when(col("p_type") === "PROMO", disc).otherwise(lit(0).cast("decimal(18,2)")))
            .cast("double").as("promo_revenue"),
          sum(disc).cast("double").as("total_revenue"),
          count(lit(1)).as("n"))
    }),

    // TPC-H Q7-shaped volume shipping: two broadcast copies of the nation
    // dim under different roles, bidirectional nation-pair filter, per-year
    // rollup; only the fact⋈fact joins shuffle.
    "q7_volume_shipping" -> ((s, d) => {
      val li = Tables.lineitem(s, d)
        .filter(col("l_shipdate") >= lit("1995-01-01") &&
          col("l_shipdate") < lit("1997-01-01"))
      val n1 = Tables.nation(s, d)
        .select(col("n_nationkey").as("n1_key"), col("n_name").as("supp_nation"))
      val n2 = Tables.nation(s, d)
        .select(col("n_nationkey").as("n2_key"), col("n_name").as("cust_nation"))
      val vol = col("l_extendedprice").cast("decimal(18,2)") *
        (lit(1).cast("decimal(18,2)") - col("l_discount").cast("decimal(18,2)"))
      li.join(broadcast(Tables.supplier(s, d)), col("l_suppkey") === col("s_suppkey"))
        .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
        .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
        .join(broadcast(n1), col("s_nationkey") === col("n1_key"))
        .join(broadcast(n2), col("c_nationkey") === col("n2_key"))
        .filter((col("supp_nation") === "NATION_1" && col("cust_nation") === "NATION_2") ||
          (col("supp_nation") === "NATION_2" && col("cust_nation") === "NATION_1"))
        .groupBy(col("supp_nation"), col("cust_nation"),
          year(col("l_shipdate")).cast("long").as("l_year"))
        .agg(sum(vol).cast("double").as("revenue"), count(lit(1)).as("n"))
    }),

    // TPC-H Q10-shaped returned-item report: top-20 customers by lost
    // revenue — join + agg + TakeOrdered (deterministic tie-break on key)
    "q10_returned_items" -> ((s, d) => {
      val li = Tables.lineitem(s, d).filter(col("l_returnflag") === "R")
      val o = Tables.orders(s, d)
        .filter(col("o_orderdate") >= lit("1995-10-01") &&
          col("o_orderdate") < lit("1996-01-01"))
      val rev = col("l_extendedprice").cast("decimal(18,2)") *
        (lit(1).cast("decimal(18,2)") - col("l_discount").cast("decimal(18,2)"))
      li.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
        .groupBy("c_custkey", "c_name", "c_mktsegment")
        .agg(sum(rev).cast("double").as("revenue"), count(lit(1)).as("n_items"))
        .orderBy(col("revenue").desc, col("c_custkey"))
        .limit(20)
    }),

    // Pure range join (NO equi key): clicks attributed to 30-min windows
    // after high-value purchases. Naively this is a BroadcastNestedLoop/
    // cartesian plan; Intervals.bucketedIntervalJoin manufactures a bucket
    // equi key (1h buckets) so it shuffles like any hash join
    // (PlanSpec-guarded: no BNLJ/cartesian in the plan).
    "j_range_bucketed" -> ((s, d) => {
      val e = ev(s, d).withColumn("ts_ms", expr("ts_ns div 1000000"))
      val iv = e.filter(col("event_type") === "purchase" && col("value") > 20)
        .select(col("event_id").as("iv_id"), col("ts_ms").as("start_ms"),
          (col("ts_ms") + 1800000L).as("end_ms"))
      val pts = e.filter(col("event_type") === "click")
        .select(col("ts_ms"), col("value"))
      graft.ops.Intervals.bucketedIntervalJoin(pts, "ts_ms", iv,
          "start_ms", "end_ms", bucketWidth = 3600000L)
        .groupBy("iv_id")
        .agg(count(lit(1)).as("n_clicks"),
          sum(floor(col("value") * 1e6)).as("click_value_mu"))
    }),

    // Skew-proof salted join (oracle = the PLAIN join): lineitem fact side
    // salted deterministically, orders dim side replicated salts×, join on
    // (key, salt) — a hot orderkey's rows spread over 8 reducers. Covers
    // what AQE can't: streaming stateful joins pin partitioning by key.
    "skew_salted_join" -> ((s, d) => {
      val li = Tables.lineitem(s, d)
      val o = Tables.orders(s, d)
        .select(col("o_orderkey").as("l_orderkey"), col("o_orderpriority"))
      graft.ops.Skew.saltedJoin(li, o, "l_orderkey", "l_partkey", salts = 8)
        .groupBy("o_orderpriority")
        .agg(sum(col("l_quantity").cast("decimal(18,2)")).cast("double").as("qty"),
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
    }),

    // blocked fuzzy match (record linkage): distinct part names pairing
    // within first-token blocks at edit distance 1-4 (exact dups excluded).
    // Hot-block guard explicitly OFF (Int.MaxValue): the oracle is the
    // unthinned SQL, and an implicit default cap would silently diverge
    // once a verification corpus grows a 1000-row block — the _capped twin
    // below proves the guarded path with a stride-mirrored oracle.
    "j_fuzzy_blocked" -> ((s, d) => {
      val names = Tables.part(s, d).select(col("p_name")).distinct()
      graft.ops.Fuzzy.blockedEditPairs(names, "p_name", "p_name",
          split(col("p_name"), " ").getItem(0), maxDist = 4, minDist = 1,
          maxBlock = Int.MaxValue)
        .select(col("id_a").as("name_a"), col("id_b").as("name_b"), col("dist"))
    }),

    // the guarded path, deliberately tiny cap so the md5 thinning stride
    // FIRES on sf0.01's size-8 first-token blocks and the oracle
    // reproduces it predicate-for-predicate (the ann_*_capped contract)
    "j_fuzzy_blocked_capped" -> ((s, d) => {
      val names = Tables.part(s, d).select(col("p_name")).distinct()
      graft.ops.Fuzzy.blockedEditPairs(names, "p_name", "p_name",
          split(col("p_name"), " ").getItem(0), maxDist = 4, minDist = 1,
          maxBlock = 4)
        .select(col("id_a").as("name_a"), col("id_b").as("name_b"), col("dist"))
    }),

    // TPC-H Q22-shaped dormant-capital report: scalar-subquery threshold
    // (exact decimal average → one double) + anti join on orders
    "q22_dormant_customers" -> ((s, d) => {
      val c = Tables.customer(s, d)
      val thr = c.filter(col("c_acctbal") > 0.0)
        .agg((sum(col("c_acctbal").cast("decimal(18,2)")).cast("double") /
          count(lit(1)).cast("double")).as("thr"))
      c.join(broadcast(thr))
        .filter(col("c_acctbal") > col("thr"))
        .join(Tables.orders(s, d).select(col("o_custkey")),
          col("c_custkey") === col("o_custkey"), "left_anti")
        .groupBy("c_mktsegment")
        .agg(count(lit(1)).as("numcust"),
          sum(col("c_acctbal").cast("decimal(18,2)")).cast("double").as("totacctbal"))
    }),

    // TPC-H Q8-shaped national market share: one nation's slice of a
    // region+part-type market per order year — the case-sum / sum ratio
    // over the deepest join tree in the suite (7 tables; every dim
    // broadcast, only fact-fact shuffles). Numerator and denominator are
    // EXACT decimal sums, cast to double only for the final division
    // (then floor6 so a boundary ulp can't flip the hash).
    "q8_market_share" -> ((s, d) => {
      val li = Tables.lineitem(s, d)
        .select("l_orderkey", "l_partkey", "l_suppkey", "l_extendedprice", "l_discount")
      val o = Tables.orders(s, d)
        .filter(col("o_orderdate") >= lit("1995-01-01") &&
          col("o_orderdate") <= lit("1996-12-31"))
        .select("o_orderkey", "o_custkey", "o_orderdate")
      val cust = Tables.customer(s, d).select("c_custkey", "c_nationkey")
      val cn = Tables.nation(s, d)
        .select(col("n_nationkey").as("cn_key"), col("n_regionkey"))
      val reg = Tables.region(s, d).filter(col("r_name") === "ASIA")
        .select("r_regionkey")
      val sup = Tables.supplier(s, d).select("s_suppkey", "s_nationkey")
      val sn = Tables.nation(s, d)
        .select(col("n_nationkey").as("sn_key"), col("n_name").as("supp_nation"))
      val p = Tables.part(s, d).filter(col("p_type") === "ECONOMY").select("p_partkey")
      val volume = col("l_extendedprice").cast("decimal(18,2)") *
        (lit(1).cast("decimal(18,2)") - col("l_discount").cast("decimal(18,2)"))
      li.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(cust, col("o_custkey") === col("c_custkey"))
        .join(broadcast(cn), col("c_nationkey") === col("cn_key"))
        .join(broadcast(reg), col("n_regionkey") === col("r_regionkey"))
        .join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(sn), col("s_nationkey") === col("sn_key"))
        .join(broadcast(p), col("l_partkey") === col("p_partkey"))
        .select(year(col("o_orderdate")).as("o_year"), volume.as("volume"),
          col("supp_nation"))
        .groupBy("o_year")
        .agg(graft.ops.Text.floor6(
          sum(when(col("supp_nation") === "NATION_3", col("volume"))
            .otherwise(lit(0).cast("decimal(18,2)"))).cast("double") /
            sum(col("volume")).cast("double")).as("mkt_share"))
    }),

    // TPC-H Q9-shaped product profit by supplier nation and order year.
    // RESHAPED: the corpus has no partsupp table, so profit omits the
    // ps_supplycost·l_quantity term and is pure discounted revenue — the
    // structural content (LIKE part filter, supplier-nation rollup,
    // per-year grouping over a 5-way join) is intact.
    "q9_product_profit" -> ((s, d) => {
      val p = Tables.part(s, d).filter(col("p_name").like("%widget%"))
        .select("p_partkey")
      val sup = Tables.supplier(s, d).select("s_suppkey", "s_nationkey")
      val n = Tables.nation(s, d)
        .select(col("n_nationkey"), col("n_name").as("nation"))
      val o = Tables.orders(s, d).select("o_orderkey", "o_orderdate")
      Tables.lineitem(s, d)
        .select("l_orderkey", "l_partkey", "l_suppkey", "l_extendedprice", "l_discount")
        .join(broadcast(p), col("l_partkey") === col("p_partkey"))
        .join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
        .join(o, col("l_orderkey") === col("o_orderkey"))
        .select(col("nation"), year(col("o_orderdate")).as("o_year"),
          (col("l_extendedprice").cast("decimal(18,2)") *
            (lit(1).cast("decimal(18,2)") - col("l_discount").cast("decimal(18,2)")))
            .as("amount"))
        .groupBy("nation", "o_year")
        .agg(sum("amount").cast("double").as("sum_profit"))
    }),

    // TPC-H Q16-shaped supplier-relationship count. RESHAPED: supplier-part
    // links come from DISTINCT lineitem (no partsupp table); the NOT IN
    // denylist (anti join) and the count(DISTINCT supplier) per part
    // attribute triple are the Q16 structure.
    "q16_supplier_cnt" -> ((s, d) => {
      val links = Tables.lineitem(s, d)
        .select(col("l_partkey"), col("l_suppkey")).distinct()
      val p = Tables.part(s, d)
        .filter(col("p_brand") =!= "Brand#19" && col("p_type") =!= "PROMO")
        .select("p_partkey", "p_brand", "p_type", "p_size")
      val deny = Tables.supplier(s, d)
        .filter(col("s_suppkey") % 5 === 0).select("s_suppkey")
      links
        .join(broadcast(p), col("l_partkey") === col("p_partkey"))
        .join(broadcast(deny), col("l_suppkey") === col("s_suppkey"), "left_anti")
        .groupBy("p_brand", "p_type", "p_size")
        .agg(countDistinct("l_suppkey").as("supplier_cnt"))
    }),

    // TPC-H Q2-shaped best-supplier-per-part: the correlated min-cost
    // subquery decorrelated into a per-part arg-max. RESHAPED (no partsupp
    // cost): supplier-part links come from distinct lineitem and "best" is
    // the highest-acctbal EUROPE supplier, ties to the smallest suppkey —
    // deterministic via one mergeable max_by on a lexicographic struct (no
    // per-part sort).
    "q2_best_supplier" -> ((s, d) => {
      val links = Tables.lineitem(s, d)
        .select(col("l_partkey"), col("l_suppkey")).distinct()
      val p = Tables.part(s, d)
        .filter(col("p_type") === "STANDARD" && col("p_size") <= 15)
        .select("p_partkey")
      val sup = Tables.supplier(s, d)
        .join(broadcast(Tables.nation(s, d)), col("s_nationkey") === col("n_nationkey"))
        .join(broadcast(Tables.region(s, d).filter(col("r_name") === "EUROPE")),
          col("n_regionkey") === col("r_regionkey"))
        .select(col("s_suppkey"), col("s_name"), col("s_acctbal"), col("n_name"))
      links
        .join(broadcast(p), col("l_partkey") === col("p_partkey"))
        .join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
        .groupBy("p_partkey")
        .agg(max_by(
          struct(col("s_name"), col("n_name"), col("s_acctbal"), col("s_suppkey")),
          struct(col("s_acctbal"), lit(Long.MaxValue) - col("s_suppkey"))).as("b"))
        .select(col("p_partkey"), col("b.s_name").as("s_name"),
          col("b.n_name").as("nation"), col("b.s_acctbal").as("s_acctbal"))
    }),

    // TPC-H Q11-shaped important stock: per-(nation, part) revenue whose
    // share of the nation's total clears a fraction threshold — the
    // HAVING-against-a-global-aggregate structure. RESHAPED: value comes
    // from lineitem revenue (no partsupp); the threshold compare is EXACT
    // (decimal·1000 vs decimal — no float division anywhere).
    "q11_important_stock" -> ((s, d) => {
      val sup = Tables.supplier(s, d).select("s_suppkey", "s_nationkey")
      val n = Tables.nation(s, d).select(col("n_nationkey"), col("n_name").as("nation"))
      val rev = Tables.lineitem(s, d)
        .select(col("l_partkey"), col("l_suppkey"),
          (col("l_extendedprice").cast("decimal(18,2)") *
            (lit(1).cast("decimal(18,2)") - col("l_discount").cast("decimal(18,2)")))
            .as("amount"))
        .join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
      val np = rev.groupBy("nation", "l_partkey").agg(sum("amount").as("val_np"))
      val tot = rev.groupBy("nation").agg(sum("amount").as("tot_n"))
      np.join(broadcast(tot), "nation")
        .filter(col("val_np") * 1000 > col("tot_n"))
        .select(col("nation"), col("l_partkey").as("p_partkey"),
          col("val_np").cast("double").as("value"))
    }),

    // TPC-H Q20-shaped shipment concentration: suppliers who shipped MORE
    // THAN HALF of a part's 1995 volume — the nested-aggregate threshold
    // structure (Q20's 0.5·sum(qty) correlation) decorrelated into two
    // keyed aggregations and an exact integer 2·qty_ps > qty_p compare.
    "q20_part_concentration" -> ((s, d) => {
      val li95 = Tables.lineitem(s, d)
        .filter(col("l_shipdate") >= lit("1995-01-01") &&
          col("l_shipdate") < lit("1996-01-01"))
        .select(col("l_partkey"), col("l_suppkey"), col("l_quantity").cast("long").as("qty"))
      val ps = li95.groupBy("l_partkey", "l_suppkey").agg(sum("qty").as("qty_ps"))
      val pTot = li95.groupBy("l_partkey").agg(sum("qty").as("qty_p"))
      ps.join(pTot, "l_partkey")
        .filter(col("qty_ps") * 2 > col("qty_p"))
        .join(broadcast(Tables.supplier(s, d).select("s_suppkey", "s_name")),
          col("l_suppkey") === col("s_suppkey"))
        .groupBy("s_name")
        .agg(count(lit(1)).as("n_dominated_parts"), sum("qty_ps").as("qty_total"))
    }),

    // TPC-H Q21-shaped waiting-supplier report, STRUCTURAL decorrelation:
    // the double correlated subquery (EXISTS other-supplier line, NOT EXISTS
    // other-supplier LATE line) as one semi and one anti join on
    // (order, ¬supp). Kept as the oracle-gated equivalence fixture for the
    // headline aggregate plan below — at scale the two data-sized distincts
    // + semi SMJ + anti join are the plan you would NOT want (6.1 s vs 1.2 s
    // at sf0.1), so the grouped form is the default.
    "q21_waiting_supplier_structural" -> ((s, d) => {
      val li = Tables.lineitem(s, d).select("l_orderkey", "l_suppkey", "l_shipdate")
      val o = Tables.orders(s, d).select("o_orderkey", "o_orderdate", "o_orderstatus")
      val flagged = li.join(o, col("l_orderkey") === col("o_orderkey"))
        .withColumn("late",
          col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 90 DAYS"))
      val cand = flagged.filter(col("o_orderstatus") === "F" && col("late"))
        .select(col("l_orderkey").as("ck"), col("l_suppkey").as("cs"))
      val others = li.select(col("l_orderkey").as("xk"), col("l_suppkey").as("xs")).distinct()
      val lateOthers = flagged.filter(col("late"))
        .select(col("l_orderkey").as("yk"), col("l_suppkey").as("ys")).distinct()
      cand
        .join(others, col("ck") === col("xk") && col("cs") =!= col("xs"), "left_semi")
        .join(lateOthers, col("ck") === col("yk") && col("cs") =!= col("ys"), "left_anti")
        .join(broadcast(Tables.supplier(s, d)), col("cs") === col("s_suppkey"))
        .groupBy("s_name")
        .agg(count(lit(1)).as("numwait"))
    }),

    // TPC-H Q21-shaped waiting-supplier report, HEADLINE plan: the
    // EXISTS/NOT-EXISTS pair decorrelated to ONE per-order aggregate
    // instead of semi+anti joins: "another supplier exists" ⟺
    // min(supp) ≠ max(supp), "exactly one late supplier" ⟺
    // min(late supp) = max(late supp) (the candidate is late itself, so it
    // IS that unique one), and the surviving rows are the order's late
    // lineitems. min/max predicates instead of countDistinct keep the
    // aggregation Expand-free — plain mergeable partials, ONE grouped pass
    // where the structural form runs two data-sized distincts + a semi SMJ
    // + an anti join. The oracle is LITERALLY the structural twin's,
    // pinning the rewrite's equivalence through the gate every round.
    "q21_waiting_supplier" -> ((s, d) => {
      val li = Tables.lineitem(s, d).select("l_orderkey", "l_suppkey", "l_shipdate")
      val o = Tables.orders(s, d).select("o_orderkey", "o_orderdate", "o_orderstatus")
      val flagged = li.join(o, col("l_orderkey") === col("o_orderkey"))
        .withColumn("late",
          col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 90 DAYS"))
      flagged.groupBy("l_orderkey").agg(
          min(col("l_suppkey")).as("supp_lo"),
          max(col("l_suppkey")).as("supp_hi"),
          min(when(col("late"), col("l_suppkey"))).as("late_lo"),
          max(when(col("late"), col("l_suppkey"))).as("late_hi"),
          sum(when(col("late"), 1L).otherwise(0L)).as("late_rows"),
          max(when(col("o_orderstatus") === "F", 1).otherwise(0)).as("is_f"))
        .filter(col("is_f") === 1 && col("late_lo").isNotNull &&
          col("late_lo") === col("late_hi") && col("supp_lo") < col("supp_hi"))
        .join(broadcast(Tables.supplier(s, d)), col("late_lo") === col("s_suppkey"))
        .groupBy("s_name")
        .agg(sum(col("late_rows")).as("numwait"))
    }),

    // TPC-H Q13-shaped customer order-count distribution: double
    // aggregation with a left join keeping zero-order customers
    "q13_order_distribution" -> ((s, d) => {
      val o = Tables.orders(s, d).filter(col("o_orderpriority") =!= "5-LOW")
      Tables.customer(s, d)
        .join(o, col("c_custkey") === col("o_custkey"), "left")
        .groupBy("c_custkey")
        .agg(count(col("o_orderkey")).as("c_count"))
        .groupBy("c_count")
        .agg(count(lit(1)).as("custdist"))
    }),

    // TPC-H Q18-shaped large-volume orders: HAVING subselect feeds a
    // semi join, then the detail join re-aggregates
    "q18_large_orders" -> ((s, d) => {
      val li = Tables.lineitem(s, d)
      val big = li.groupBy("l_orderkey")
        .agg(sum(col("l_quantity").cast("long")).as("sum_qty"))
        .filter(col("sum_qty") > 180L)
        .select("l_orderkey", "sum_qty")
      Tables.orders(s, d)
        .join(big, col("o_orderkey") === col("l_orderkey"))
        .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
        .select("c_custkey", "c_name", "o_orderkey", "o_totalprice", "sum_qty")
    }),

    // TPC-H Q15-shaped top supplier: quarterly per-supplier revenue, keep
    // the argmax row(s) via a 1-row broadcast of the max — no global sort
    "q15_top_supplier" -> ((s, d) => {
      val rev = Tables.lineitem(s, d)
        .filter(col("l_shipdate") >= lit("1996-01-01") &&
          col("l_shipdate") < lit("1996-04-01"))
        .groupBy("l_suppkey")
        .agg(sum(col("l_extendedprice").cast("decimal(18,2)") *
          (lit(1).cast("decimal(18,2)") - col("l_discount").cast("decimal(18,2)")))
          .cast("double").as("total_revenue"))
      val mx = rev.agg(max("total_revenue").as("mx"))
      Tables.supplier(s, d)
        .join(rev, col("s_suppkey") === col("l_suppkey"))
        .join(broadcast(mx))
        .filter(col("total_revenue") === col("mx"))
        .select("s_suppkey", "s_name", "total_revenue")
    }),

    // TPC-H Q17-shaped small-quantity revenue: correlated per-part average
    // decorrelated into a keyed aggregate + join (exact integer-valued
    // sums so the 0.2·avg threshold is bit-identical cross-engine)
    "q17_small_qty_revenue" -> ((s, d) => {
      val li = Tables.lineitem(s, d)
      val partAvg = li.groupBy(col("l_partkey").as("pa_key"))
        .agg((sum(col("l_quantity").cast("long")).cast("double") /
          count(lit(1)).cast("double")).as("avg_qty"))
      val brand = Tables.part(s, d).filter(col("p_brand") === "Brand#1")
      li.join(broadcast(brand), col("l_partkey") === col("p_partkey"))
        .join(partAvg, col("l_partkey") === col("pa_key"))
        .filter(col("l_quantity") < lit(0.2) * col("avg_qty"))
        .agg((sum(col("l_extendedprice").cast("decimal(18,2)")).cast("double") / lit(7.0))
          .as("avg_yearly"), count(lit(1)).as("n"))
    }),

    // TPC-H Q4-shaped order-priority check: date-windowed orders that have
    // at least one late-shipping line — EXISTS = left-semi with a
    // cross-side residual, then a tiny rollup
    "q4_order_priority" -> ((s, d) => {
      val o = Tables.orders(s, d)
        .filter(col("o_orderdate") >= lit("1995-07-01") &&
          col("o_orderdate") < lit("1995-10-01"))
      val li = Tables.lineitem(s, d).select("l_orderkey", "l_shipdate")
      o.join(li, col("o_orderkey") === col("l_orderkey") &&
          col("l_shipdate") >= col("o_orderdate") + expr("INTERVAL 60 DAYS"), "left_semi")
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("order_count"))
    }),

    // TPC-H Q12-shaped priority split: conditional counts (CASE inside two
    // sums) over the fact-fact join, grouped by return flag
    "q12_priority_split" -> ((s, d) => {
      val li = Tables.lineitem(s, d)
        .filter(col("l_shipdate") >= lit("1996-01-01") &&
          col("l_shipdate") < lit("1997-01-01"))
      val o = Tables.orders(s, d)
      li.join(o, col("l_orderkey") === col("o_orderkey"))
        .groupBy("l_returnflag")
        .agg(
          sum(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1L)
            .otherwise(0L)).as("high_count"),
          sum(when(!col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1L)
            .otherwise(0L)).as("low_count"))
    }),

    // TPC-H Q19-shaped disjunctive pushdown: OR-of-ANDs across both join
    // sides — Catalyst must split the common l_quantity bounds below the
    // join while keeping the residual disjunction
    "q19_brand_revenue" -> ((s, d) => {
      val li = Tables.lineitem(s, d)
      val p = Tables.part(s, d)
      val joined = li.join(broadcast(p), col("l_partkey") === col("p_partkey"))
        .filter(
          (col("p_brand") === "Brand#1" && col("p_size").between(1, 15) &&
            col("l_quantity").between(1, 20)) ||
          (col("p_brand") === "Brand#13" && col("p_size").between(10, 30) &&
            col("l_quantity").between(10, 35)))
      joined.agg(
        sum(col("l_extendedprice").cast("decimal(18,2)") *
          (lit(1).cast("decimal(18,2)") - col("l_discount").cast("decimal(18,2)")))
          .cast("double").as("revenue"),
        count(lit(1)).as("n"))
    }),

    // post-linkage survivorship: duplicate part rows (same p_name entity)
    // collapse to one golden record — newest non-null attribute wins
    // (nulls injected deterministically so the fallback path executes)
    "link_golden_record" -> ((s, d) => {
      val p = Tables.part(s, d).select(col("p_name"), col("p_partkey"),
        expr("CASE WHEN p_partkey % 3 = 0 THEN NULL ELSE p_brand END").as("p_brand"),
        expr("CASE WHEN p_partkey % 5 = 0 THEN NULL ELSE p_size END").as("p_size"))
      graft.ops.Fuzzy.goldenRecords(p, "p_name", "p_partkey", Seq("p_brand", "p_size"))
    }),

    // bloom-pruned semi join: lineitems of high-value orders. The bloom
    // (scalar subquery, codegen probe) drops non-matching rows pre-shuffle;
    // the exact semi join restores set equality with the oracle's EXISTS
    "j_bloom_prune" -> ((s, d) => {
      val hi = Tables.orders(s, d).filter(col("o_totalprice") > 400000.0)
        .select("o_orderkey")
      graft.ops.Bloom.semiJoinPruned(Tables.lineitem(s, d), hi,
          "l_orderkey", "o_orderkey", expectedItems = 1L << 16, numBits = 1L << 19)
        .groupBy("l_returnflag")
        .agg(count(lit(1)).as("n_items"),
          sum(col("l_quantity").cast("long")).as("sum_qty"))
    }),

    // bucketed co-located fact-fact join (ops/Bucketing): both sides
    // pre-shuffled into 8 aligned buckets on the join key at write time,
    // so the sort-merge join plans with ZERO Exchange (BucketingSpec pins
    // it) — the 100 TB answer to joins too big to broadcast. First touch
    // per session pays the layout write; reps measure the join itself.
    "j_bucketed_colocated" -> ((s, d) => {
      val ord = graft.ops.Bucketing.tableName("orders", d)
      val li = graft.ops.Bucketing.tableName("lineitem", d)
      graft.ops.Bucketing.ensureBucketed(s, ord, 8, "o_orderkey")(
        Tables.orders(s, d).select("o_orderkey", "o_orderpriority"))
      graft.ops.Bucketing.ensureBucketed(s, li, 8, "l_orderkey")(
        Tables.lineitem(s, d).select("l_orderkey", "l_extendedprice", "l_discount"))
      graft.ops.Bucketing.colocatedJoin(s, ord, li, "o_orderkey", "l_orderkey")
        .groupBy("o_orderpriority")
        .agg(
          sum(col("l_extendedprice").cast("decimal(18,2)") *
            (lit(1).cast("decimal(18,2)") - col("l_discount").cast("decimal(18,2)")))
            .cast("double").as("revenue"),
          count(lit(1)).as("n_items"))
    }),

    // bucket-pruned point lookup on the same layout: an IN-list on the
    // bucket key prunes to the matching ≤4-of-8 buckets at PLANNING time
    // (SelectedBucketsCount in the scan), and the groupBy on the bucket
    // key runs exchange-free on top. The agg is ALSO what keeps bucketed
    // scanning on: Spark's DisableUnnecessaryBucketedScan drops the
    // bucketed access path (and with it the pruning) when no upstream
    // operator wants the hash distribution (BucketingSpec pins both
    // behaviors) — the index-free point-read path needs a distribution
    // consumer or an explicit opt-out of autoBucketedScan.
    "j_bucketed_pruned_scan" -> ((s, d) => {
      val ord = graft.ops.Bucketing.tableName("orders", d)
      graft.ops.Bucketing.ensureBucketed(s, ord, 8, "o_orderkey")(
        Tables.orders(s, d).select("o_orderkey", "o_orderpriority"))
      s.table(ord)
        .filter(col("o_orderkey").isin(1L, 7L, 32L, 33L, 3333L))
        .groupBy("o_orderkey")
        .agg(count(lit(1)).as("n"), max(col("o_orderpriority")).as("prio"))
    }))

  val oracle: Map[String, String] = Map(
    "j_asof" ->
      """WITH p AS (SELECT event_id AS p_id, user_id, epoch_us(ts) AS ets
        |           FROM events WHERE event_type = 'purchase'),
        |v AS (SELECT user_id, epoch_us(ts) AS vts, event_id AS v_id, "value" AS v_value
        |      FROM events WHERE event_type = 'view')
        |SELECT p.p_id, p.user_id, p.ets, v.vts, v.v_id, v.v_value
        |FROM p ASOF LEFT JOIN v ON p.user_id = v.user_id AND p.ets >= v.vts""".stripMargin,

    "j_asof_compact" ->
      """WITH p AS (SELECT event_id AS p_id, user_id, epoch_us(ts) AS ets
        |           FROM events WHERE event_type = 'purchase'),
        |v AS (SELECT user_id, epoch_us(ts) AS vts, event_id AS v_id, "value" AS v_value
        |      FROM events WHERE event_type = 'view')
        |SELECT p.p_id, p.user_id, p.ets, v.vts, v.v_id, v.v_value
        |FROM p ASOF LEFT JOIN v ON p.user_id = v.user_id AND p.ets >= v.vts""".stripMargin,

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

    "q5_local_supplier" ->
      """SELECT n_name,
        |  sum(l_extendedprice::DECIMAL(18,2) * (1::DECIMAL(18,2) - l_discount::DECIMAL(18,2)))::DOUBLE AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA'
        |GROUP BY n_name""".stripMargin,

    "q6_forecast_revenue" ->
      """SELECT
        |  sum(l_extendedprice::DECIMAL(18,2) * l_discount::DECIMAL(18,2))::DOUBLE AS revenue,
        |  count(*) AS n
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        |  AND l_shipdate < TIMESTAMP '1997-01-01'
        |  AND l_discount >= 0.03 AND l_discount <= 0.07
        |  AND l_quantity < 24""".stripMargin,

    "q14_promo_revenue" ->
      """SELECT
        |  sum(CASE WHEN p_type = 'PROMO'
        |           THEN l_extendedprice::DECIMAL(18,2) * (1::DECIMAL(18,2) - l_discount::DECIMAL(18,2))
        |           ELSE 0::DECIMAL(18,2) END)::DOUBLE AS promo_revenue,
        |  sum(l_extendedprice::DECIMAL(18,2) * (1::DECIMAL(18,2) - l_discount::DECIMAL(18,2)))::DOUBLE AS total_revenue,
        |  count(*) AS n
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        |  AND l_shipdate < TIMESTAMP '1996-04-01'""".stripMargin,

    "j_range_bucketed" ->
      """WITH iv AS (SELECT event_id AS iv_id, epoch_ms(ts) AS start_ms,
        |                   epoch_ms(ts) + 1800000 AS end_ms
        |            FROM events WHERE event_type = 'purchase' AND "value" > 20),
        |pts AS (SELECT epoch_ms(ts) AS ts_ms, "value" FROM events
        |        WHERE event_type = 'click')
        |SELECT iv_id, count(*) AS n_clicks,
        |       sum(CAST(floor("value" * 1e6) AS BIGINT))::BIGINT AS click_value_mu
        |FROM pts JOIN iv ON pts.ts_ms >= iv.start_ms AND pts.ts_ms < iv.end_ms
        |GROUP BY iv_id""".stripMargin,

    "skew_salted_join" ->
      """SELECT o_orderpriority,
        |  sum(l_quantity::DECIMAL(18,2))::DOUBLE AS qty,
        |  count(*) AS n_items
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY o_orderpriority""".stripMargin,

    "j_semi_anti" ->
      """SELECT c_custkey, TRUE AS has_orders FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |UNION ALL
        |SELECT c_custkey, FALSE AS has_orders FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)""".stripMargin,

    // exact decimal sums then one double cast, mirroring the engine
    "q7_volume_shipping" ->
      """SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
        |       year(l_shipdate)::BIGINT AS l_year,
        |       sum(l_extendedprice::DECIMAL(18,2) *
        |           (1::DECIMAL(18,2) - l_discount::DECIMAL(18,2)))::DOUBLE AS revenue,
        |       count(*) AS n
        |FROM lineitem
        |JOIN supplier ON s_suppkey = l_suppkey
        |JOIN orders ON o_orderkey = l_orderkey
        |JOIN customer ON c_custkey = o_custkey
        |JOIN nation n1 ON s_nationkey = n1.n_nationkey
        |JOIN nation n2 ON c_nationkey = n2.n_nationkey
        |WHERE l_shipdate >= '1995-01-01' AND l_shipdate < '1997-01-01'
        |  AND ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2') OR
        |       (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
        |GROUP BY 1, 2, 3""".stripMargin,

    "q10_returned_items" ->
      """WITH agg AS (
        |  SELECT c_custkey, c_name, c_mktsegment,
        |         sum(l_extendedprice::DECIMAL(18,2) *
        |             (1::DECIMAL(18,2) - l_discount::DECIMAL(18,2)))::DOUBLE AS revenue,
        |         count(*) AS n_items
        |  FROM lineitem
        |  JOIN orders ON o_orderkey = l_orderkey
        |  JOIN customer ON c_custkey = o_custkey
        |  WHERE l_returnflag = 'R'
        |    AND o_orderdate >= '1995-10-01' AND o_orderdate < '1996-01-01'
        |  GROUP BY 1, 2, 3)
        |SELECT c_custkey, c_name, c_mktsegment, revenue, n_items FROM (
        |  SELECT *, row_number() OVER (ORDER BY revenue DESC, c_custkey) AS rnk FROM agg)
        |WHERE rnk <= 20""".stripMargin,

    "j_fuzzy_blocked" ->
      """WITH n AS (SELECT DISTINCT p_name FROM part),
        |b AS (SELECT p_name, split_part(p_name, ' ', 1) AS blk FROM n)
        |SELECT a.p_name AS name_a, c.p_name AS name_b,
        |       levenshtein(a.p_name, c.p_name)::BIGINT AS dist
        |FROM b a JOIN b c ON a.blk = c.blk AND a.p_name < c.p_name
        |WHERE levenshtein(a.p_name, c.p_name) BETWEEN 1 AND 4""".stripMargin,

    // thinning stride mirrored predicate-for-predicate: RIGHT-side rows of
    // a block over the cap survive iff h32(p_name || '_blkthin') lands on
    // the ceil(size/cap) stride — the left side stays unthinned, exactly
    // like Fuzzy.blockedEditPairs
    "j_fuzzy_blocked_capped" ->
      """WITH n AS (SELECT DISTINCT p_name FROM part),
        |b AS (SELECT p_name, split_part(p_name, ' ', 1) AS blk FROM n),
        |sz AS (SELECT blk, count(*) AS bsize FROM b GROUP BY blk),
        |kept AS (
        |  SELECT b.p_name, b.blk
        |  FROM b JOIN sz USING (blk)
        |  WHERE bsize <= 4
        |     OR (('0x' || substr(md5(b.p_name || '_blkthin'), 1, 8))::BIGINT
        |         % ceil(bsize::DOUBLE / 4)::BIGINT) = 0)
        |SELECT a.p_name AS name_a, c.p_name AS name_b,
        |       levenshtein(a.p_name, c.p_name)::BIGINT AS dist
        |FROM b a JOIN kept c ON a.blk = c.blk AND a.p_name < c.p_name
        |WHERE levenshtein(a.p_name, c.p_name) BETWEEN 1 AND 4""".stripMargin,

    "q2_best_supplier" ->
      """WITH sup AS (
        |  SELECT s_suppkey, s_name, s_acctbal, n_name
        |  FROM supplier
        |  JOIN nation ON s_nationkey = n_nationkey
        |  JOIN region ON n_regionkey = r_regionkey
        |  WHERE r_name = 'EUROPE'),
        |cand AS (
        |  SELECT p_partkey, s_name, n_name AS nation, s_acctbal,
        |         row_number() OVER (PARTITION BY p_partkey
        |           ORDER BY s_acctbal DESC, s_suppkey) AS rn
        |  FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem)
        |  JOIN part ON l_partkey = p_partkey
        |  JOIN sup ON l_suppkey = s_suppkey
        |  WHERE p_type = 'STANDARD' AND p_size <= 15)
        |SELECT p_partkey, s_name, nation, s_acctbal
        |FROM cand WHERE rn = 1""".stripMargin,

    "q11_important_stock" ->
      """WITH rev AS (
        |  SELECT n_name AS nation, l_partkey,
        |         l_extendedprice::DECIMAL(18,2) *
        |           (1::DECIMAL(18,2) - l_discount::DECIMAL(18,2)) AS amount
        |  FROM lineitem
        |  JOIN supplier ON l_suppkey = s_suppkey
        |  JOIN nation ON s_nationkey = n_nationkey),
        |np AS (SELECT nation, l_partkey, sum(amount) AS val_np
        |       FROM rev GROUP BY nation, l_partkey),
        |tot AS (SELECT nation, sum(amount) AS tot_n FROM rev GROUP BY nation)
        |SELECT np.nation, l_partkey AS p_partkey, val_np::DOUBLE AS "value"
        |FROM np JOIN tot USING (nation)
        |WHERE val_np * 1000 > tot_n""".stripMargin,

    "q20_part_concentration" ->
      """WITH li95 AS (
        |  SELECT l_partkey, l_suppkey, l_quantity::BIGINT AS qty
        |  FROM lineitem
        |  WHERE l_shipdate >= '1995-01-01' AND l_shipdate < '1996-01-01'),
        |ps AS (SELECT l_partkey, l_suppkey, sum(qty)::BIGINT AS qty_ps
        |       FROM li95 GROUP BY l_partkey, l_suppkey),
        |pt AS (SELECT l_partkey, sum(qty)::BIGINT AS qty_p
        |       FROM li95 GROUP BY l_partkey)
        |SELECT s_name, count(*)::BIGINT AS n_dominated_parts,
        |       sum(qty_ps)::BIGINT AS qty_total
        |FROM ps JOIN pt USING (l_partkey)
        |JOIN supplier ON l_suppkey = s_suppkey
        |WHERE qty_ps * 2 > qty_p
        |GROUP BY s_name""".stripMargin,

    "q8_market_share" ->
      """WITH vol AS (
        |  SELECT year(o_orderdate) AS o_year,
        |         l_extendedprice::DECIMAL(18,2) *
        |           (1::DECIMAL(18,2) - l_discount::DECIMAL(18,2)) AS volume,
        |         sn.n_name AS supp_nation
        |  FROM lineitem
        |  JOIN orders   ON l_orderkey = o_orderkey
        |  JOIN customer ON o_custkey = c_custkey
        |  JOIN nation cn ON c_nationkey = cn.n_nationkey
        |  JOIN region   ON cn.n_regionkey = r_regionkey
        |  JOIN supplier ON l_suppkey = s_suppkey
        |  JOIN nation sn ON s_nationkey = sn.n_nationkey
        |  JOIN part     ON l_partkey = p_partkey
        |  WHERE r_name = 'ASIA' AND p_type = 'ECONOMY'
        |    AND o_orderdate BETWEEN DATE '1995-01-01' AND DATE '1996-12-31')
        |SELECT o_year,
        |  floor(sum(CASE WHEN supp_nation = 'NATION_3' THEN volume
        |                 ELSE 0::DECIMAL(18,2) END)::DOUBLE
        |        / sum(volume)::DOUBLE * 1000000) / 1000000.0 AS mkt_share
        |FROM vol GROUP BY o_year""".stripMargin,

    "q9_product_profit" ->
      """SELECT n_name AS nation, year(o_orderdate) AS o_year,
        |  sum(l_extendedprice::DECIMAL(18,2) *
        |      (1::DECIMAL(18,2) - l_discount::DECIMAL(18,2)))::DOUBLE AS sum_profit
        |FROM lineitem
        |JOIN part     ON l_partkey = p_partkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation   ON s_nationkey = n_nationkey
        |JOIN orders   ON l_orderkey = o_orderkey
        |WHERE p_name LIKE '%widget%'
        |GROUP BY n_name, year(o_orderdate)""".stripMargin,

    "q16_supplier_cnt" ->
      """SELECT p_brand, p_type, p_size, count(DISTINCT l_suppkey) AS supplier_cnt
        |FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem)
        |JOIN part ON l_partkey = p_partkey
        |WHERE p_brand <> 'Brand#19' AND p_type <> 'PROMO'
        |  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_suppkey % 5 = 0)
        |GROUP BY p_brand, p_type, p_size""".stripMargin,

    "q22_dormant_customers" ->
      """WITH thr AS (
        |  SELECT sum(c_acctbal::DECIMAL(18,2))::DOUBLE / count(*)::DOUBLE AS thr
        |  FROM customer WHERE c_acctbal > 0.0)
        |SELECT c_mktsegment, count(*) AS numcust,
        |       sum(c_acctbal::DECIMAL(18,2))::DOUBLE AS totacctbal
        |FROM customer, thr
        |WHERE c_acctbal > thr.thr
        |  AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |GROUP BY c_mktsegment""".stripMargin,

    "q21_waiting_supplier" -> q21Sql,
    // the structural semi+anti twin answers the SAME question — one
    // oracle text, two physical strategies, both gated every round
    "q21_waiting_supplier_structural" -> q21Sql,

    "q13_order_distribution" ->
      """SELECT c_count, count(*) AS custdist FROM (
        |  SELECT c_custkey, count(o_orderkey)::BIGINT AS c_count
        |  FROM customer LEFT JOIN orders
        |    ON c_custkey = o_custkey AND o_orderpriority <> '5-LOW'
        |  GROUP BY c_custkey)
        |GROUP BY c_count""".stripMargin,

    "q18_large_orders" ->
      """WITH big AS (
        |  SELECT l_orderkey, sum(l_quantity::BIGINT)::BIGINT AS sum_qty
        |  FROM lineitem GROUP BY l_orderkey HAVING sum(l_quantity::BIGINT) > 180)
        |SELECT c_custkey, c_name, o_orderkey, o_totalprice, sum_qty
        |FROM orders
        |JOIN big ON o_orderkey = big.l_orderkey
        |JOIN customer ON o_custkey = c_custkey""".stripMargin,

    "q15_top_supplier" ->
      """WITH rev AS (
        |  SELECT l_suppkey,
        |    sum(l_extendedprice::DECIMAL(18,2) *
        |        (1::DECIMAL(18,2) - l_discount::DECIMAL(18,2)))::DOUBLE AS total_revenue
        |  FROM lineitem
        |  WHERE l_shipdate >= '1996-01-01' AND l_shipdate < '1996-04-01'
        |  GROUP BY l_suppkey)
        |SELECT s_suppkey, s_name, total_revenue
        |FROM supplier JOIN rev ON s_suppkey = l_suppkey
        |WHERE total_revenue = (SELECT max(total_revenue) FROM rev)""".stripMargin,

    // avg decomposed as exact-integer sum / count in BOTH engines so the
    // 0.2·avg comparison can't drift
    "q17_small_qty_revenue" ->
      """WITH pa AS (
        |  SELECT l_partkey AS pa_key,
        |         sum(l_quantity::BIGINT)::DOUBLE / count(*)::DOUBLE AS avg_qty
        |  FROM lineitem GROUP BY l_partkey)
        |SELECT sum(l_extendedprice::DECIMAL(18,2))::DOUBLE / 7.0 AS avg_yearly,
        |       count(*) AS n
        |FROM lineitem
        |JOIN part ON l_partkey = p_partkey AND p_brand = 'Brand#1'
        |JOIN pa ON l_partkey = pa_key
        |WHERE l_quantity < 0.2 * avg_qty""".stripMargin,

    "q4_order_priority" ->
      """SELECT o_orderpriority, count(*) AS order_count
        |FROM orders
        |WHERE o_orderdate >= '1995-07-01' AND o_orderdate < '1995-10-01'
        |  AND EXISTS (SELECT 1 FROM lineitem
        |              WHERE l_orderkey = o_orderkey
        |                AND l_shipdate >= o_orderdate + INTERVAL 60 DAY)
        |GROUP BY o_orderpriority""".stripMargin,

    "q12_priority_split" ->
      """SELECT l_returnflag,
        |  sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END)::BIGINT AS high_count,
        |  sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END)::BIGINT AS low_count
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |WHERE l_shipdate >= '1996-01-01' AND l_shipdate < '1997-01-01'
        |GROUP BY l_returnflag""".stripMargin,

    "q19_brand_revenue" ->
      """SELECT
        |  sum(l_extendedprice::DECIMAL(18,2) *
        |      (1::DECIMAL(18,2) - l_discount::DECIMAL(18,2)))::DOUBLE AS revenue,
        |  count(*) AS n
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15
        |       AND l_quantity BETWEEN 1 AND 20)
        |   OR (p_brand = 'Brand#13' AND p_size BETWEEN 10 AND 30
        |       AND l_quantity BETWEEN 10 AND 35)""".stripMargin,

    // arg_max skips NULL ordinals in both engines — the survivorship rule
    "link_golden_record" ->
      """WITH p AS (SELECT p_name, p_partkey,
        |  CASE WHEN p_partkey % 3 = 0 THEN NULL ELSE p_brand END AS p_brand,
        |  CASE WHEN p_partkey % 5 = 0 THEN NULL ELSE p_size END AS p_size
        |  FROM part)
        |SELECT p_name,
        |  arg_max(p_brand, CASE WHEN p_brand IS NOT NULL THEN p_partkey END) AS p_brand,
        |  arg_max(p_size, CASE WHEN p_size IS NOT NULL THEN p_partkey END) AS p_size,
        |  count(*) AS n_members
        |FROM p GROUP BY p_name""".stripMargin,

    // the bloom is an optimization, not a semantics change: result ≡ EXISTS
    "j_bloom_prune" ->
      """SELECT l_returnflag, count(*) AS n_items,
        |       sum(l_quantity::BIGINT)::BIGINT AS sum_qty
        |FROM lineitem l
        |WHERE EXISTS (SELECT 1 FROM orders o
        |              WHERE o.o_orderkey = l.l_orderkey AND o.o_totalprice > 400000.0)
        |GROUP BY l_returnflag""".stripMargin,

    // the bucketed layout is an access-path choice, not a semantic one:
    // the oracle is the plain join/filter over the raw tables
    "j_bucketed_colocated" ->
      """SELECT o_orderpriority,
        |  sum(l_extendedprice::DECIMAL(18,2) * (1::DECIMAL(18,2) - l_discount::DECIMAL(18,2)))::DOUBLE AS revenue,
        |  count(*) AS n_items
        |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        |GROUP BY o_orderpriority""".stripMargin,

    "j_bucketed_pruned_scan" ->
      """SELECT o_orderkey, count(*) AS n, max(o_orderpriority) AS prio
        |FROM orders WHERE o_orderkey IN (1, 7, 32, 33, 3333)
        |GROUP BY o_orderkey""".stripMargin)
}
