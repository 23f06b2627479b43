package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.api.StreamRegistry

/** Explicit-schema source DDL — the reference statement shape
  * `CREATE STREAM s (COL TYPE, ...) WITH (kafka_topic='t',
  * value_format='...', key='col');`
  * (`DatabaseSelectAndProjectIntTest.java:269-281`; map-typed columns from
  * `StreamsSelectAndProjectIntTest.java:330-344`): topics register as raw
  * envelope frames, the DDL decodes `value` against the declared schema,
  * and the stream lands in the registry with ROWKEY/ROWTIME like any
  * CSAS-derived stream.
  */
class SourceDdlSpec extends SparkSpec {
  import spark.implicits._

  private val t0 = 1700000000000L

  private def envelope(rows: Seq[(String, Long)]) =
    rows.map { case (v, ts) => (v.getBytes("UTF-8"), new Timestamp(ts)) }
      .toDF("value", "timestamp")

  test("JSON source DDL: reference statement decodes, keys, and timestamps") {
    val reg = new StreamRegistry(spark)
    reg.registerTopic("orders_topic", envelope(Seq(
      ("""{"ordertime": 1, "orderid": "a", "itemid": "i1", "orderunits": 10.5}""", t0),
      ("""{"ordertime": 2, "orderid": "b", "orderunits": 40.25}""", t0 + 1000), // itemid absent → null
      ("not json at all", t0 + 2000))))                                        // malformed → all null
    val out = reg.sql("CREATE STREAM orders (ORDERTIME bigint, ORDERID varchar, ITEMID " +
      "varchar, ORDERUNITS double) " +
      "WITH (kafka_topic='orders_topic', value_format='JSON', key='ordertime');")
    assert(out.columns.toSeq === Seq("ORDERTIME", "ORDERID", "ITEMID", "ORDERUNITS",
      "ROWKEY", "ROWTIME"))
    val rows = spark.sql("SELECT ORDERID, ITEMID, ORDERUNITS, ROWKEY, ROWTIME FROM orders")
      .collect().map(r => (r.getAs[String](0), Option(r.getAs[String](1)),
        Option(r.get(2)), Option(r.get(3)), Option(r.get(4)))).toSet
    assert(rows === Set(
      ("a", Some("i1"), Some(10.5), Some(1L), Some(t0)),
      ("b", None, Some(40.25), Some(2L), Some(t0 + 1000)),
      (null, None, None, None, Some(t0 + 2000))))
    // the declared stream feeds CSAS like any other (the reference chains
    // exactly this: declare, then project from it)
    val derived = reg.sql(
      "CREATE STREAM big_orders AS SELECT ORDERID, ORDERUNITS FROM orders WHERE ORDERUNITS > 40;")
    assert(derived.as[(String, Double)].collect().toSet === Set(("b", 40.25)))
  }

  test("map-typed declared column (StreamsSelectAndProjectIntTest shape)") {
    val reg = new StreamRegistry(spark)
    reg.registerTopic("maps_topic", envelope(Seq(
      ("""{"itemid": "x", "keyvaluemap": {"key1": 1.5, "key2": 2.0}}""", t0))))
    reg.sql("CREATE STREAM mapped (ITEMID varchar, KEYVALUEMAP " +
      "map<varchar, double>) WITH (kafka_topic='maps_topic', value_format='JSON');")
    val m = spark.sql("SELECT ITEMID, KEYVALUEMAP['key2'] AS v FROM mapped")
      .as[(String, Double)].head()
    assert(m === ("x", 2.0))
  }

  test("DELIMITED source DDL casts positionally; rejects nested types") {
    val reg = new StreamRegistry(spark)
    reg.registerTopic("csv_topic", envelope(Seq(("7,foo,3.25", t0))))
    reg.sql("CREATE STREAM csvs (ID bigint, NAME varchar, SCORE double) " +
      "WITH (kafka_topic='csv_topic', value_format='DELIMITED', key='id');")
    assert(spark.sql("SELECT ID, NAME, SCORE, ROWKEY FROM csvs")
      .as[(Long, String, Double, Long)].head() === ((7L, "foo", 3.25, 7L)))
    val e = intercept[IllegalArgumentException] {
      reg.sql("CREATE STREAM bad (M map<varchar, double>) " +
        "WITH (kafka_topic='csv_topic', value_format='DELIMITED');")
    }
    assert(e.getMessage.contains("DELIMITED"))
  }

  test("AVRO source DDL decodes registry-framed values; timestamp reassigns ROWTIME") {
    val client = new graft.serde.InMemorySchemaRegistry
    val reg = new StreamRegistry(spark, Some(client))
    val payload = Seq((5L, "avro-row", t0 + 500)).toDF("ordertime", "orderid", "ets")
    val framed = graft.serde.AvroCodec.encodeFramed(
      payload, Seq("ordertime", "orderid", "ets"), client, "avro_topic-value")
    reg.registerTopic("avro_topic", framed.select(col("value")))
    reg.sql("CREATE STREAM avros (ORDERTIME bigint, ORDERID varchar, ETS bigint) " +
      "WITH (kafka_topic='avro_topic', value_format='AVRO', key='ordertime', " +
      "timestamp='ets');")
    val r = spark.sql("SELECT ORDERTIME, ORDERID, ROWKEY, ROWTIME FROM avros")
      .as[(Long, String, Long, Long)].head()
    assert(r === ((5L, "avro-row", 5L, t0 + 500)))
  }

  test("loud failures: unknown topic, undeclared key, unknown type/format") {
    val reg = new StreamRegistry(spark)
    assert(intercept[IllegalArgumentException](
      reg.sql("CREATE STREAM s (A bigint) WITH (kafka_topic='ghost');"))
      .getMessage.contains("unknown topic"))
    reg.registerTopic("t1", envelope(Seq(("""{"a": 1}""", t0))))
    assert(intercept[IllegalArgumentException](
      reg.sql("CREATE STREAM s (A bigint) WITH (kafka_topic='t1', key='b');"))
      .getMessage.contains("key column"))
    assert(intercept[IllegalArgumentException](
      reg.sql("CREATE STREAM s (A frobnicate) WITH (kafka_topic='t1');"))
      .getMessage.contains("unsupported KSQL column type"))
    assert(intercept[IllegalArgumentException](
      reg.sql("CREATE STREAM s (A bigint) WITH (kafka_topic='t1', value_format='XML');"))
      .getMessage.contains("unsupported value_format"))
  }

  test("streaming topic: the same DDL text drives a live stream end-to-end") {
    implicit val ctx = spark.sqlContext
    val reg = new StreamRegistry(spark)
    val in = MemoryStream[(Array[Byte], Timestamp)]
    reg.registerTopic("live_topic", in.toDF().toDF("value", "timestamp"))
    val stream = reg.sql("CREATE STREAM live (ORDERTIME bigint, ORDERUNITS double) " +
      "WITH (kafka_topic='live_topic', value_format='JSON', key='ordertime');")
    val q = stream.writeStream.format("memory").queryName("live_ddl")
      .outputMode("append").start()
    try {
      in.addData(("""{"ordertime": 9, "orderunits": 1.25}""".getBytes("UTF-8"),
        new Timestamp(t0)))
      q.processAllAvailable()
      val r = spark.table("live_ddl")
        .select("ORDERTIME", "ORDERUNITS", "ROWKEY", "ROWTIME")
        .as[(Long, Double, Long, Long)].head()
      assert(r === ((9L, 1.25, 9L, t0)))
    } finally q.stop()
  }
}
