package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types._

/** Kafka topic source/sink adapters (SURVEY §2.1 S1/S7 — reference
  * `builder.stream(inputTopic)` / `.to(outputTopic)`,
  * `KafkaWordCount.java:58,66-67`).
  *
  * Spark's Kafka connector already exposes the reference's record envelope
  * (key, value, timestamp, topic, partition, offset, headers —
  * `ConnectSourceConsumer.convertRecords` shape) as columns; these helpers
  * pin the config surface and the decode/encode conventions. Everything
  * downstream of `.load()` — envelope decode, header access, re-encode —
  * is pure column logic over [[envelopeSchema]] and is runtime-exercised
  * via MemoryStream twins (`KafkaEnvelopeSpec`).
  *
  * NOTE: `.load()`/`.start()` themselves require `spark-sql-kafka-0-10` on
  * the runtime classpath. That artifact is not present in this build
  * environment (no egress; verified absent from /opt/spark/jars and the
  * coursier cache). The provider-lookup seam is exercised instead by the
  * [[FileTopicSource]] ("file-topic") DSv2 source/sink, which serves this
  * exact envelope schema from append-only segment files through the same
  * `DataSourceRegister` registry — see COVERAGE.md S1/S7.
  */
object Kafka {

  /** The Kafka source's fixed output schema (with `includeHeaders=true`) —
    * the reference's record envelope, one column per
    * `ConsumerRecord` field (`ConnectSourceConsumer.convertRecords:255-298`;
    * headers per-field at `convertHeaderFor:300-312`).
    */
  val envelopeSchema: StructType = StructType(Seq(
    StructField("key", BinaryType),
    StructField("value", BinaryType),
    StructField("topic", StringType),
    StructField("partition", IntegerType),
    StructField("offset", LongType),
    StructField("timestamp", TimestampType),
    StructField("timestampType", IntegerType),
    StructField("headers", ArrayType(StructType(Seq(
      StructField("key", StringType),
      StructField("value", BinaryType)))))))

  /** Resolved option map for the source — pure, so the config surface is
    * testable without the connector jar. `maxOffsetsPerTrigger` is the
    * admission-control analogue of the reference's bounded source queue
    * (capacity 5000, `ConnectSourceConsumer.java:169`).
    */
  def sourceOptions(brokers: String, topics: String,
      startingOffsets: String = "earliest",
      maxOffsetsPerTrigger: Option[Long] = None,
      includeHeaders: Boolean = true): Map[String, String] =
    Map(
      "kafka.bootstrap.servers" -> brokers,
      "subscribe" -> topics,
      "startingOffsets" -> startingOffsets,
      "includeHeaders" -> includeHeaders.toString) ++
      maxOffsetsPerTrigger.map("maxOffsetsPerTrigger" -> _.toString)

  /** S1: subscribe to topics as an unbounded stream. */
  def source(spark: SparkSession, brokers: String, topics: String,
      startingOffsets: String = "earliest", maxOffsetsPerTrigger: Option[Long] = None): DataFrame =
    spark.readStream.format("kafka")
      .options(sourceOptions(brokers, topics, startingOffsets, maxOffsetsPerTrigger))
      .load()

  /** S5: decode the value payload (JSON) into typed columns, keeping the
    * record envelope (ROWKEY/ROWTIME sources) alongside.
    */
  def decodeJsonValue(df: DataFrame, schema: StructType): DataFrame =
    df.select(
      col("key").cast("string").as("ROWKEY_RAW"),
      col("timestamp").as("ROWTIME_TS"),
      from_json(col("value").cast("string"), schema).as("v"))
      .select(col("ROWKEY_RAW"), col("ROWTIME_TS"), col("v.*"))

  // ---- record headers (reference `convertHeaderFor`:
  // ConnectSourceConsumer.java:300-312 — ordered multi-map, values are
  // converter-serialized bytes; Connect's `Headers.lastWithName` reads the
  // LAST occurrence of a key) ----

  /** Header value (binary) for `key`, last occurrence wins; null if absent
    * or the headers column is null. Headers are small per-record arrays, so
    * the interpreted HOF filter is fine here (never a corpus-scale hot path).
    */
  def headerValue(headersCol: Column, key: String): Column =
    try_element_at(filter(headersCol, h => h.getField("key") === key), lit(-1))
      .getField("value")

  /** Header value decoded as UTF-8 string (the string-converter case). */
  def headerString(headersCol: Column, key: String): Column =
    headerValue(headersCol, key).cast("string")

  /** Append a (key, UTF-8 value) header, preserving order and duplicates —
    * Connect `Headers.add` semantics. Creates the array if null.
    */
  def withHeader(headersCol: Column, key: String, value: Column): Column =
    concat(coalesce(headersCol, array().cast(envelopeSchema("headers").dataType)),
      array(struct(lit(key).as("key"), value.cast("string").cast("binary").as("value"))))

  /** S9: encode columns back to a Kafka-writable frame; pass `headers` to
    * carry a headers column through to the sink (the producer writes
    * headers whenever the frame HAS a `headers` column — no option
    * involved; `includeHeaders` exists only on the read side).
    */
  def encodeJsonValue(keyCol: Column, payload: Column,
      headers: Option[Column] = None): DataFrame => DataFrame =
    df => {
      val base = Seq(keyCol.cast("string").as("key"), to_json(payload).as("value"))
      df.select(base ++ headers.map(_.as("headers")): _*)
    }

  /** S7: produce to a topic (at-least-once; pair with idempotent consumers
    * or exactly-once sinks downstream).
    */
  def sink(df: DataFrame, brokers: String, topic: String,
      checkpointLocation: String): StreamingQuery =
    df.writeStream.format("kafka")
      .option("kafka.bootstrap.servers", brokers)
      .option("topic", topic)
      .option("checkpointLocation", checkpointLocation)
      .start()
}
