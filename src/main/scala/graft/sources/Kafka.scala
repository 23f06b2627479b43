package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types.StructType

/** Kafka topic source/sink adapters (SURVEY §2.1 S1/S7 — reference
  * `builder.stream(inputTopic)` / `.to(outputTopic)`,
  * `KafkaWordCount.java:58,66-67`).
  *
  * Spark's Kafka connector already exposes the reference's record envelope
  * (key, value, timestamp, topic, partition, offset, headers —
  * `ConnectSourceConsumer.convertRecords` shape) as columns; these helpers
  * pin the config surface and the decode/encode conventions.
  *
  * NOTE: requires `spark-sql-kafka-0-10` on the classpath at runtime (not
  * bundled in this build environment — compile-level adapter; the e2e
  * word-count topology is exercised through the Memory/JDBC twins instead,
  * which share every operator downstream of the source).
  */
object Kafka {

  /** S1: subscribe to topics as an unbounded stream. */
  def source(spark: SparkSession, brokers: String, topics: String,
      startingOffsets: String = "earliest", maxOffsetsPerTrigger: Option[Long] = None): DataFrame = {
    val r = spark.readStream.format("kafka")
      .option("kafka.bootstrap.servers", brokers)
      .option("subscribe", topics)
      .option("startingOffsets", startingOffsets)
    maxOffsetsPerTrigger.fold(r)(m => r.option("maxOffsetsPerTrigger", m)).load()
  }

  /** S5: decode the value payload (JSON) into typed columns, keeping the
    * record envelope (ROWKEY/ROWTIME sources) alongside.
    */
  def decodeJsonValue(df: DataFrame, schema: StructType): DataFrame =
    df.select(
      col("key").cast("string").as("ROWKEY_RAW"),
      col("timestamp").as("ROWTIME_TS"),
      from_json(col("value").cast("string"), schema).as("v"))
      .select(col("ROWKEY_RAW"), col("ROWTIME_TS"), col("v.*"))

  /** S9: encode columns back to a Kafka-writable frame. */
  def encodeJsonValue(keyCol: Column, payload: Column): DataFrame => DataFrame =
    df => df.select(keyCol.cast("string").as("key"), to_json(payload).as("value"))

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
