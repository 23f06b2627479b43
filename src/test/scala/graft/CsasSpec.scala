package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.api.StreamRegistry

/** KSQL select/project/filter semantics on the reference's orders fixture
  * (FIXTURES.md F2; reference `OrderDataProvider.java:51-115` — 8 rows, keys
  * "1".."8", ORDERUNITS = i*10.0), asserted against the golden expectations
  * of `StreamsSelectAndProjectIntTest.java`.
  */
class CsasSpec extends SparkSpec {
  import spark.implicits._

  /** The 8-row orders fixture. ROWTIME source: ORDERTIME as epoch-ms. */
  private def ordersFixture: DataFrame =
    (1 to 8).map { i =>
      (i.toLong, if (i >= 7) "ORDER_6" else s"ORDER_$i", s"ITEM_$i", i * 10.0,
        Seq(i * 1.0, i * 2.0, i * 3.0), Map("key1" -> 1.0, "key2" -> 2.0, "key3" -> 3.0))
    }.toDF("ORDERTIME", "ORDERID", "ITEMID", "ORDERUNITS", "PRICEARRAY", "KEYVALUEMAP")

  private def reg: StreamRegistry = {
    val r = new StreamRegistry(spark)
    r.createStream("orders_fx", ordersFixture,
      keyCol = Some("ORDERTIME"), timeCol = Some("ORDERTIME"), timeIsEpochMs = true)
    r
  }

  test("SELECT * returns all 8 rows with pseudo-columns (P6/P9, ref :293-306)") {
    val out = reg.createStreamAs("s_star", "SELECT * FROM orders_fx")
    assert(out.count() === 8)
    assert(out.columns.contains("ROWKEY") && out.columns.contains("ROWTIME"))
    assert(out.select("ROWKEY").as[Long].collect().sorted === (1L to 8L).toArray)
  }

  test("projection SELECT ITEMID, ORDERUNITS, PRICEARRAY (P5, ref :247-263)") {
    val out = reg.createStreamAs("s_proj", "SELECT ITEMID, ORDERUNITS, PRICEARRAY FROM orders_fx")
    assert(out.columns.toSeq === Seq("ITEMID", "ORDERUNITS", "PRICEARRAY"))
    val row8 = out.filter($"ITEMID" === "ITEM_8").collect().head
    assert(row8.getDouble(1) === 80.0)
    assert(row8.getSeq[Double](2) === Seq(8.0, 16.0, 24.0))
  }

  test("SELECT * WHERE ORDERUNITS > 40 keeps exactly 4 rows (P10, ref :312-324)") {
    val out = reg.createStreamAs("s_filter", "SELECT * FROM orders_fx WHERE ORDERUNITS > 40")
    assert(out.count() === 4)
    assert(out.select("ITEMID").as[String].collect().toSet ===
      Set("ITEM_5", "ITEM_6", "ITEM_7", "ITEM_8"))
  }

  test("alias + conjunction filter hits the single key-8 row (P7/P10, ref :217-239)") {
    val out = reg.createStreamAs("s_alias",
      """SELECT ROWKEY AS RKEY, ROWTIME AS RTIME, ITEMID FROM orders_fx
        |WHERE ORDERUNITS > 20 AND ITEMID = 'ITEM_8'""".stripMargin)
    val rows = out.collect()
    assert(rows.length === 1)
    assert(rows.head.getAs[Long]("RKEY") === 8L)
    assert(rows.head.getAs[String]("ITEMID") === "ITEM_8")
  }

  test("timestamp reassignment WITH (timestamp='RTIME') rebases ROWTIME (P12, ref :174-209)") {
    val r = reg
    r.createStreamAs("s_ts",
      "SELECT ROWKEY, ROWTIME + 10000 AS RTIME, ROWTIME + 100 AS RT100 FROM orders_fx",
      timestampCol = Some("RTIME"))
    val out = r.stream("s_ts").df
    // derived stream's event time = RTIME = original ROWTIME + 10000
    assert(out.filter($"ROWKEY" === 3L).select("ROWTIME").as[Long].head() === 3L + 10000L)
    assert(out.filter($"ROWKEY" === 3L).select("RT100").as[Long].head() === 3L + 100L)
    assert(r.stream("s_ts").timeCol.contains("RTIME"))
  }

  test("textual CSAS statement: CREATE STREAM ... WITH (timestamp=...) AS SELECT (ref :312)") {
    val r = reg
    // the reference's literal statement shape, our fixture
    val out = r.sql("CREATE STREAM BIGORDERS AS SELECT * FROM orders_fx WHERE ORDERUNITS > 40;")
    assert(out.count() === 4)
    assert(r.names.contains("BIGORDERS"))
    // WITH (timestamp=...) reassigns the derived stream's event time
    r.sql("""CREATE STREAM TS_S WITH (timestamp='RTIME', value_format='JSON') AS
            |SELECT ROWKEY, ROWTIME + 10000 AS RTIME FROM orders_fx""".stripMargin)
    assert(r.stream("TS_S").timeCol.contains("RTIME"))
    assert(r.stream("TS_S").df.filter($"ROWKEY" === 2L)
      .select("ROWTIME").as[Long].head() === 2L + 10000L)
    // non-CSAS passes through to spark.sql
    assert(r.sql("SELECT count(*) AS c FROM orders_fx").as[Long].head() === 8L)
  }

  test("multi-statement script: the reference's literal two-CSAS string (ref :174-185)") {
    val r = reg
    // StreamsSelectAndProjectIntTest.java:174-185 verbatim, with the
    // format placeholders bound to our fixture names — TWO CSAS statements
    // in ONE sql() call, the second reading the first's output
    val out = r.sql(
      "CREATE STREAM STREAM1 WITH (timestamp='RTIME') AS SELECT ROWKEY AS RKEY, " +
        "ROWTIME+10000 AS " +
        "RTIME, ROWTIME+100 AS RT100, ORDERID, ITEMID " +
        "FROM orders_fx WHERE ORDERUNITS > 20 AND ITEMID = 'ITEM_8'; " +
        "CREATE STREAM STREAM2 AS SELECT ROWKEY AS NEWRKEY, " +
        "ROWTIME AS NEWRTIME, RKEY, RTIME, RT100, ORDERID, ITEMID " +
        "FROM STREAM1 ;")
    // both streams registered; the returned frame is the LAST statement's
    assert(r.names.contains("STREAM1") && r.names.contains("STREAM2"))
    assert(out.columns.toSeq ===
      Seq("NEWRKEY", "NEWRTIME", "RKEY", "RTIME", "RT100", "ORDERID", "ITEMID"))
    val rows = out.collect()
    assert(rows.length === 1)
    val row = rows.head
    // the reference's golden expectations (its key "8" row): RTIME =
    // original ROWTIME + 10000, and STREAM1's reassigned event time is what
    // STREAM2 inherits as ROWTIME/NEWRTIME
    assert(row.getAs[Long]("RKEY") === 8L)
    assert(row.getAs[Long]("RTIME") === 8L + 10000L)
    assert(row.getAs[Long]("NEWRTIME") === 8L + 10000L)
    assert(row.getAs[Long]("RT100") === 8L + 100L)
    assert(row.getAs[String]("ORDERID") === "ORDER_6")
    assert(row.getAs[String]("ITEMID") === "ITEM_8")
  }

  test("statement splitter: top-level semicolons only, quoted ones survive") {
    import graft.api.StreamRegistry.splitStatements
    assert(splitStatements("SELECT 1; SELECT 2 ;") === Seq("SELECT 1", "SELECT 2"))
    // ';' inside string literals / quoted identifiers must not split;
    // '' escape keeps the literal open across an embedded quote
    assert(splitStatements("SELECT 'a;b' AS x; SELECT 'it''s; fine' AS y") ===
      Seq("SELECT 'a;b' AS x", "SELECT 'it''s; fine' AS y"))
    assert(splitStatements("SELECT `c;1` FROM t; SELECT \"d;2\" FROM u") ===
      Seq("SELECT `c;1` FROM t", "SELECT \"d;2\" FROM u"))
    assert(splitStatements("  ;;  SELECT 1  ;; ") === Seq("SELECT 1"))
    // a multi-statement CSAS script mixes with WITH options carrying ';'
    assert(splitStatements(
      "CREATE STREAM A WITH (note='x;y') AS SELECT 1; CREATE STREAM B AS SELECT 2").size === 2)
    // ';' inside comments must not split either
    assert(splitStatements(
      "SELECT 1 -- trailing; note\n; SELECT /* a;b */ 2").size === 2)
    assert(splitStatements("-- only a comment; nothing else") ===
      Seq("-- only a comment; nothing else"))
  }

  test("CSAS tokenizer handles option values the old regex could not") {
    val r = reg
    // ')' and ',' and the literal text "timestamp=" inside OTHER option
    // values — the regex matcher's documented limits, now parsed per-pair
    val out = r.sql(
      """CREATE STREAM TRICKY WITH (kafka_topic='a)b,c', note='not timestamp=X',
        |  quote='it''s', timestamp='RTIME') AS
        |SELECT ROWKEY, ROWTIME + 10000 AS RTIME FROM orders_fx;""".stripMargin)
    assert(out.count() === 8)
    assert(r.stream("TRICKY").timeCol.contains("RTIME"))
    assert(r.stream("TRICKY").df.filter($"ROWKEY" === 5L)
      .select("ROWTIME").as[Long].head() === 5L + 10000L)
    // empty options list, no-options form, and lowercase keywords all parse
    assert(r.sql("create stream LC with () as select ITEMID from orders_fx").count() === 8)
    // dotted option keys (kafka-config style) are accepted-and-ignored,
    // as the old regex surface did
    assert(r.sql(
      "CREATE STREAM DOTTED WITH (cleanup.policy='compact') AS SELECT ITEMID FROM orders_fx"
    ).count() === 8)
    // malformed CREATE STREAM fails fast with a position, not a Spark parse error
    val e = intercept[IllegalArgumentException](
      r.sql("CREATE STREAM BROKEN WITH (timestamp='X' AS SELECT 1"))
    assert(e.getMessage.contains("position"))
    intercept[IllegalArgumentException](
      r.sql("CREATE STREAM NOBODY AS INSERT INTO x VALUES (1)"))
    // CREATE <not-stream> still passes through to spark.sql untouched
    r.sql("CREATE TEMPORARY VIEW pass_v AS SELECT 42 AS a")
    assert(spark.table("pass_v").as[Int].head() === 42)
  }

  test("CTAS: CREATE TABLE compacts a stream to latest-per-key; Spark DDL passes through") {
    // key by ORDERID: rows 6,7,8 share "ORDER_6" — the table keeps the
    // latest (ORDERTIME 8, ORDERUNITS 80) per the KTable compaction contract
    val r = new StreamRegistry(spark)
    r.createStream("orders_ctas", ordersFixture,
      keyCol = Some("ORDERID"), timeCol = Some("ORDERTIME"), timeIsEpochMs = true)
    val t = r.sql("CREATE TABLE LATEST_ORDERS AS SELECT ROWKEY, ROWTIME, ORDERUNITS FROM orders_ctas;")
    assert(t.count() === 6, "8 rows compact to 6 distinct keys")
    assert(t.filter($"ROWKEY" === "ORDER_6").select("ORDERUNITS").as[Double].head() === 80.0)
    assert(r.names.contains("LATEST_ORDERS"))
    // an aggregated SELECT is already a table: registers as-is
    val agg = r.sql(
      "CREATE TABLE UNITS_BY_ITEM AS SELECT ITEMID, sum(ORDERUNITS) AS total FROM orders_ctas GROUP BY ITEMID;")
    assert(agg.count() === 8)
    // Spark's own CREATE TABLE DDL shapes are NOT intercepted
    spark.sql("DROP TABLE IF EXISTS ctas_passthrough")
    r.sql("CREATE TABLE ctas_passthrough USING parquet AS SELECT 7 AS x")
    assert(spark.table("ctas_passthrough").as[Int].head() === 7)
    spark.sql("DROP TABLE ctas_passthrough")
  }

  test("bad records are skipped, query still answers (P13, ref :151-166)") {
    val jsonRows = ordersFixture
      .select(to_json(struct($"ORDERTIME", $"ITEMID", $"ORDERUNITS")).as("payload"))
      .unionByName(Seq("something that is not json").toDF("payload"))
    val parsed = jsonRows.select(
      from_json($"payload",
        org.apache.spark.sql.types.StructType.fromDDL(
          "ORDERTIME BIGINT, ITEMID STRING, ORDERUNITS DOUBLE")).as("r"))
      .filter($"r".isNotNull)
      .select("r.*")
      .filter($"ORDERUNITS" > 40)
    assert(parsed.count() === 4)
  }
}
