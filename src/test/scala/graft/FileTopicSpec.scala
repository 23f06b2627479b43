package graft

import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.{Files, Path, StandardOpenOption}

import scala.collection.mutable

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
import graft.sources.Kafka

/** The file-topic DSv2 provider: the full
  * `readStream.format("file-topic").load() → decode → sink` path through a
  * REAL provider lookup (META-INF/services registry — the same seam
  * `format("kafka")` resolves through, whose jar this environment lacks).
  */
class FileTopicSpec extends SparkSpec {
  import spark.implicits._

  private def tmpDir(prefix: String): Path = Files.createTempDirectory(prefix)

  private def jl(key: String, value: String, ts: Long, hs: (String, String)*): String = {
    val headers = hs.map { case (k, v) => s"""{"key":"$k","value":"$v"}""" }
      .mkString("[", ",", "]")
    val kj = if (key == null) "null" else s""""$key""""
    s"""{"key":$kj,"value":"$value","timestamp":$ts,"headers":$headers}"""
  }

  private def append(p: Path, lines: String*): Unit =
    Files.write(p, (lines.mkString("\n") + "\n").getBytes(UTF_8),
      StandardOpenOption.CREATE, StandardOpenOption.APPEND)

  /** Drain a streaming df through foreachBatch into a buffer. */
  private def drain(df: DataFrame, dir: Path)(body: => Unit): Seq[Row] = {
    val got = mutable.ArrayBuffer.empty[Row]
    val q = df.writeStream
      .option("checkpointLocation", tmpDir("ft_cp_").toString)
      .foreachBatch((b: DataFrame, _: Long) => { got ++= b.collect(): Unit })
      .start()
    try { body; q.processAllAvailable() } finally q.stop()
    got.toSeq
  }

  test("provider lookup by short name serves the exact Kafka envelope") {
    val dir = tmpDir("ft_")
    append(dir.resolve("words-0.jsonl"),
      jl("k1", "alpha beta", 1700000000000L, "lang" -> "en", "lang" -> "de"),
      jl(null, "gamma", 1700000001000L))
    append(dir.resolve("words-1.jsonl"), jl("k2", "delta", 1700000002000L))

    val src = spark.readStream.format("file-topic").option("path", dir.toString).load()
    assert(src.schema === Kafka.envelopeSchema, "source schema IS the Kafka envelope")

    val rows = drain(src.select(col("topic"), col("partition"), col("offset"),
      col("key").cast("string").as("k"), col("value").cast("string").as("v"),
      Kafka.headerString(col("headers"), "lang").as("lang"),
      unix_micros(col("timestamp")).as("ts_us")), dir)(())
    assert(rows.size === 3)
    assert(rows.forall(_.getAs[String]("topic") == "words"))
    val byOffset = rows.map(r => (r.getAs[Int]("partition"), r.getAs[Long]("offset")) -> r).toMap
    assert(byOffset((0, 0L)).getAs[String]("v") === "alpha beta")
    assert(byOffset((0, 0L)).getAs[String]("lang") === "de", "last-with-name header")
    assert(byOffset((0, 1L)).getAs[String]("k") == null, "null key survives")
    assert(byOffset((1, 0L)).getAs[String]("k") === "k2")
    assert(byOffset((0, 0L)).getAs[Long]("ts_us") === 1700000000000000L)
  }

  test("offsets stay unique and monotone across multiple segments of one partition") {
    // two epoch-named segment files for the SAME (topic, partition) — the
    // sink's normal output shape; per-file numbering would duplicate
    // (partition, offset) pairs across them
    val dir = tmpDir("ft_")
    append(dir.resolve("t-0.e0t0.jsonl"), jl("a", "one", 1L), jl("b", "two", 2L))
    append(dir.resolve("t-0.e1t0.jsonl"), jl("c", "three", 3L))
    val src = spark.readStream.format("file-topic").option("path", dir.toString).load()
    val rows = drain(src.select(col("offset"), col("value").cast("string")), dir)(())
      .map(r => (r.getLong(0), r.getString(1)))
    assert(rows.map(_._1).distinct.size === 3, "no duplicate offsets across segments")
    assert(rows.sortBy(_._1).map(_._2) === Seq("one", "two", "three"),
      "offset order follows segment append order")
    assert(rows.toMap.apply(1L << 32) === "three", "second segment continues, not restarts")
  }

  test("appended lines arrive as the next micro-batch with advancing offsets") {
    val dir = tmpDir("ft_")
    val seg = dir.resolve("t-0.jsonl")
    append(seg, jl("a", "one", 1L))
    val src = spark.readStream.format("file-topic").option("path", dir.toString).load()

    val got = mutable.ArrayBuffer.empty[(Long, String)]
    val batches = mutable.ArrayBuffer.empty[Int]
    val q = src.select(col("offset"), col("value").cast("string"))
      .writeStream.option("checkpointLocation", tmpDir("ft_cp_").toString)
      .foreachBatch { (b: DataFrame, _: Long) =>
        val rs = b.as[(Long, String)].collect(); got ++= rs; batches += rs.length: Unit
      }
      .start()
    try {
      q.processAllAvailable()
      append(seg, jl("b", "two", 2L), jl("c", "three", 3L))
      q.processAllAvailable()
    } finally q.stop()
    assert(got.sortBy(_._1) === Seq((0L, "one"), (1L, "two"), (2L, "three")))
    assert(batches.count(_ > 0) === 2, "append became its own batch")
  }

  test("maxOffsetsPerTrigger caps every micro-batch (admission control)") {
    val dir = tmpDir("ft_")
    append(dir.resolve("t-0.jsonl"), (1 to 7).map(i => jl(s"k$i", s"v$i", i.toLong)): _*)
    val src = spark.readStream.format("file-topic")
      .option("path", dir.toString).option("maxOffsetsPerTrigger", "3").load()
    val sizes = mutable.ArrayBuffer.empty[Long]
    val q = src.writeStream.option("checkpointLocation", tmpDir("ft_cp_").toString)
      .foreachBatch((b: DataFrame, _: Long) => { sizes += b.count(): Unit })
      .start()
    try q.processAllAvailable() finally q.stop()
    assert(sizes.filter(_ > 0).forall(_ <= 3), s"batch sizes: $sizes")
    assert(sizes.sum === 7, "everything eventually served")
  }

  test("sink writes segments the source replays: full topic round-trip") {
    implicit val ctx = spark.sqlContext
    val dir = tmpDir("ft_")
    val input = MemoryStream[(String, String)]
    val frame = Kafka.encodeJsonValue(col("_1"),
      struct(col("_2").as("word")),
      headers = Some(Kafka.withHeader(lit(null).cast(
        Kafka.envelopeSchema("headers").dataType), "src", lit("test"))))(input.toDF())
    val sink = frame.writeStream.format("file-topic")
      .option("path", dir.toString).option("topic", "out").option("numPartitions", "2")
      .option("checkpointLocation", tmpDir("ft_cp_").toString)
      .start()
    try {
      input.addData("a" -> "x", "b" -> "y", "c" -> "z")
      sink.processAllAvailable()
    } finally sink.stop()

    // replay through the source: same payloads, headers carried through,
    // partitions assigned by key hash within numPartitions
    val back = drain(spark.readStream.format("file-topic").option("path", dir.toString)
      .load()
      .select(col("partition"), col("key").cast("string").as("k"),
        get_json_object(col("value").cast("string"), "$.word").as("word"),
        Kafka.headerString(col("headers"), "src").as("src")), dir)(())
    assert(back.map(r => r.getAs[String]("k") -> r.getAs[String]("word")).toSet ===
      Set("a" -> "x", "b" -> "y", "c" -> "z"))
    assert(back.forall(_.getAs[String]("src") == "test"))
    assert(back.map(_.getAs[Int]("partition")).toSet.subsetOf(Set(0, 1)))
  }

  test("restart from checkpoint resumes after the last served offset") {
    val dir = tmpDir("ft_")
    val cp = tmpDir("ft_cp_")
    val seg = dir.resolve("t-0.jsonl")
    append(seg, jl("a", "one", 1L), jl("b", "two", 2L))
    val got = mutable.ArrayBuffer.empty[String]
    def run(): Unit = {
      val q = spark.readStream.format("file-topic").option("path", dir.toString).load()
        .select(col("value").cast("string"))
        .writeStream.option("checkpointLocation", cp.toString)
        .foreachBatch((b: DataFrame, _: Long) => { got ++= b.as[String].collect(): Unit })
        .start()
      try q.processAllAvailable() finally q.stop()
    }
    run()
    assert(got.sorted === Seq("one", "two"))
    append(seg, jl("c", "three", 3L))
    run() // new query, same checkpoint: must NOT re-serve one/two
    assert(got.sorted === Seq("one", "three", "two"))
  }
}
