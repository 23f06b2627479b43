package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.sources.Kafka

/** S1/S5/S7/S9 surface over the Kafka record envelope WITHOUT the connector
  * jar (absent from this environment): option resolution is pure; envelope
  * decode, header access (reference `ConnectSourceConsumer.convertHeaderFor`
  * :300-312, ordered multi-map, last-with-name reads) and re-encode are
  * column transforms over [[Kafka.envelopeSchema]], driven here both batch
  * and streaming (MemoryStream of envelope-shaped records).
  */
case class KHeader(key: String, value: Array[Byte])
case class KRecord(key: Array[Byte], value: Array[Byte], topic: String,
    partition: Int, offset: Long, timestamp: java.sql.Timestamp,
    timestampType: Int, headers: Array[KHeader])

class KafkaEnvelopeSpec extends SparkSpec {
  import spark.implicits._

  private def rec(k: String, v: String, off: Long, hs: (String, String)*): KRecord =
    KRecord(k.getBytes("UTF-8"), v.getBytes("UTF-8"), "t1", 0, off,
      new java.sql.Timestamp(1700000000000L + off), 0,
      hs.map { case (hk, hv) => KHeader(hk, hv.getBytes("UTF-8")) }.toArray)

  private val payloadSchema = StructType(Seq(
    StructField("user", StringType), StructField("n", LongType)))

  test("source option map resolves subscribe/offsets/admission-control/headers") {
    val opts = Kafka.sourceOptions("b:9092", "in", "latest", Some(5000L))
    assert(opts("kafka.bootstrap.servers") === "b:9092")
    assert(opts("subscribe") === "in")
    assert(opts("startingOffsets") === "latest")
    assert(opts("maxOffsetsPerTrigger") === "5000")
    assert(opts("includeHeaders") === "true")
    assert(!Kafka.sourceOptions("b", "t").contains("maxOffsetsPerTrigger"))
  }

  test("envelope-shaped records match the declared source schema") {
    val df = Seq(rec("k1", """{"user":"u1","n":1}""", 0L)).toDF()
    // names + types (nullability differs: case-class primitives are non-null)
    assert(df.schema.map(f => (f.name, f.dataType)) ===
      Kafka.envelopeSchema.map(f => (f.name, f.dataType)))
  }

  test("decodeJsonValue keeps ROWKEY/ROWTIME envelope alongside typed payload") {
    val df = Seq(
      rec("k1", """{"user":"u1","n":1}""", 0L),
      rec("k2", "not json at all", 1L)).toDF()
    val out = Kafka.decodeJsonValue(df, payloadSchema)
    val rows = out.orderBy("ROWKEY_RAW").collect()
    assert(rows(0).getAs[String]("ROWKEY_RAW") === "k1")
    assert(rows(0).getAs[String]("user") === "u1" && rows(0).getAs[Long]("n") === 1L)
    // bad record tolerated: nulls, not an exception (P13 semantics)
    assert(rows(1).isNullAt(rows(1).fieldIndex("user")))
  }

  test("header access: last-with-name wins, absent key is null, null array safe") {
    val df = Seq(
      rec("k1", "{}", 0L, "trace" -> "a", "lang" -> "en", "trace" -> "b"),
      rec("k2", "{}", 1L)).toDF()
    val out = df.select(col("offset"),
      Kafka.headerString(col("headers"), "trace").as("trace"),
      Kafka.headerString(col("headers"), "missing").as("m"))
      .orderBy("offset").collect()
    assert(out(0).getAs[String]("trace") === "b", "Headers.lastWithName semantics")
    assert(out(0).isNullAt(2))
    assert(out(1).isNullAt(1))
    // null headers column (includeHeaders=false source) never throws
    val noHs = df.select(Kafka.headerString(lit(null).cast(
      Kafka.envelopeSchema("headers").dataType), "k").as("v")).collect()
    assert(noHs.forall(_.isNullAt(0)))
  }

  test("withHeader appends preserving order/duplicates; round-trips through encode") {
    val df = Seq(rec("k1", """{"user":"u1","n":1}""", 0L, "trace" -> "a")).toDF()
    val appended = df.select(
      Kafka.withHeader(col("headers"), "lang", lit("en")).as("headers"))
    val hs = appended.select(
      transform(col("headers"), h => h.getField("key")).as("ks"),
      transform(col("headers"), h => h.getField("value").cast("string")).as("vs"))
      .as[(Seq[String], Seq[String])].head()
    assert(hs._1 === Seq("trace", "lang") && hs._2 === Seq("a", "en"))

    // S9 re-encode with headers carried through, then S5-style re-decode
    val sinkFrame = Kafka.encodeJsonValue(col("key"), struct(lit("u2").as("user"),
      lit(2L).as("n")), headers = Some(Kafka.withHeader(col("headers"), "lang", lit("en"))))(df)
    assert(sinkFrame.columns.toSeq === Seq("key", "value", "headers"))
    val back = sinkFrame.select(from_json(col("value"), payloadSchema).as("v"),
      Kafka.headerString(col("headers"), "lang").as("lang"))
      .select(col("v.user"), col("v.n"), col("lang")).as[(String, Long, String)].head()
    assert(back === (("u2", 2L, "en")))
  }

  test("streaming topology over the envelope: decode → filter by header → count") {
    implicit val ctx = spark.sqlContext
    val input = MemoryStream[KRecord]
    val decoded = Kafka.decodeJsonValue(
      input.toDF().withColumn("lang", Kafka.headerString(col("headers"), "lang")),
      payloadSchema)
    // header column survives decode only if selected before; join shape:
    // filter on the envelope-derived column then aggregate the payload
    val counted = input.toDF()
      .select(Kafka.headerString(col("headers"), "lang").as("lang"),
        from_json(col("value").cast("string"), payloadSchema).as("v"))
      .filter(col("lang") === "en")
      .groupBy(col("v.user").as("user")).agg(sum("v.n").as("total"))
    val q = counted.writeStream.format("memory").queryName("kafka_env")
      .outputMode("update").start()
    try {
      input.addData(
        rec("a", """{"user":"u1","n":3}""", 0L, "lang" -> "en"),
        rec("b", """{"user":"u1","n":4}""", 1L, "lang" -> "en"),
        rec("c", """{"user":"u2","n":9}""", 2L, "lang" -> "de"))
      q.processAllAvailable()
      val res = spark.table("kafka_env").groupBy("user").agg(max("total").as("t"))
        .as[(String, Long)].collect().toMap
      assert(res === Map("u1" -> 7L))
    } finally q.stop()
    assert(decoded.columns.contains("user"))
  }
}
