package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType
import graft.api.StreamRegistry
import graft.serde.Serdes

/** Full query lifecycle (SURVEY §3.1) without Kafka: a stream of
  * JSON-with-embedded-schema envelope records (the Connect wire format) is
  * decoded, registered as a stream with ROWKEY/ROWTIME, transformed through
  * the SQL surface, aggregated in update mode, and served — source →
  * convert → CSAS → agg → sink as one pipeline.
  */
class PipelineSpec extends SparkSpec {
  import spark.implicits._

  private val payloadSchema =
    StructType.fromDDL("user STRING, action STRING, at BIGINT")

  test("avro-encoded batch -> decode -> CSAS filter (the suite's Avro dimension)") {
    // the reference runs its select/project suite in JSON and Avro
    // (IntegrationTestHarness.getSerializer): same pipeline, Avro codec
    import graft.serde.AvroCodec
    val src = (1 to 8).map(i => (i.toLong, s"ITEM_$i", i * 10.0))
      .toDF("ORDERTIME", "ITEMID", "ORDERUNITS")
    val wire = AvroCodec.encode(src, Seq("ORDERTIME", "ITEMID", "ORDERUNITS"))
    // Avro binary is not self-describing: decode with the writer schema
    val decoded = AvroCodec.decode(wire, "value", src.schema)
    val reg = new StreamRegistry(spark)
    reg.createStream("orders_avro", decoded, keyCol = Some("ORDERTIME"),
      timeCol = Some("ORDERTIME"), timeIsEpochMs = true)
    val out = reg.sql("CREATE STREAM big_avro AS SELECT * FROM orders_avro WHERE ORDERUNITS > 40;")
    assert(out.count() === 4)
    assert(out.select("ITEMID").as[String].collect().toSet ===
      Set("ITEM_5", "ITEM_6", "ITEM_7", "ITEM_8"))
  }

  test("curation funnel: hand-exact per-stage survivor counts, pipeline semantics") {
    val en200 = "the best of the stories is that the end of the tale is the start " * 4
    val corpus = Seq(
      (1L, en200),                               // survives everything
      (2L, en200),                               // exact dup of 1 → dropped at stage 4
      (3L, "el que la de los " * 50),            // Spanish → dropped at stage 2
      (4L, "the and of to is"),                  // English but short → dropped at stage 3
      (5L, en200 + " zebra quokka wombat numbat dingo bilby kowari " * 10)
      // ↑ survives to the decontam check, where the benchmark catches it
    ).toDF("doc_id", "text")
    // benchmark shares ONLY doc 5's tail (doc 1's phrasing never appears
    // in it, so 1 must stay clean)
    val benchmark = Seq(
      (100L, "zebra quokka wombat numbat dingo bilby kowari " * 10)).toDF("doc_id", "text")
    val f = graft.ops.Curation.funnel(corpus, benchmark, "text", "doc_id")
      .select("stage", "stage_idx", "n_docs")
      .as[(String, Int, Long)].collect().sortBy(_._2)
    assert(f.map(t => (t._1, t._3)).toSeq == Seq(
      ("raw", 5L), ("lang_en", 4L), ("min_length", 3L),
      ("exact_dedup", 2L), ("decontaminated", 1L)))
    // monotone by construction: each stage filters the previous survivors
    assert(f.map(_._3).sliding(2).forall { case Array(a, b) => b <= a })
  }

  test("streaming curation gate: per-batch observed stage counts, stateless survivors") {
    implicit val ctx = spark.sqlContext
    val en200 = "the best of the stories is that the end of the tale is the start " * 4
    val benchmark = Seq(
      (100L, "zebra quokka wombat numbat dingo bilby kowari " * 10)).toDF("doc_id", "text")
    val input = MemoryStream[(Long, String)]
    val out = graft.ops.Curation.observedGate(
      input.toDF().toDF("doc_id", "text"), benchmark, "text", "doc_id")
    val q = out.writeStream.format("memory").queryName("curation_gate")
      .outputMode("append").start()
    try {
      input.addData(
        (1L, en200),
        (2L, en200),                              // exact dup passes: the gate is stateless by design
        (3L, "el que la de los " * 50),           // dropped: language
        (4L, "the and of to is"),                 // dropped: length
        (5L, en200 + " zebra quokka wombat numbat dingo bilby kowari " * 10)) // dropped: contaminated
      q.processAllAvailable()
      val survivors = spark.table("curation_gate").select("doc_id")
        .as[Long].collect().sorted
      assert(survivors.toSeq == Seq(1L, 2L))
      // the per-batch funnel rode the progress metrics — no extra jobs
      val m = q.recentProgress.flatMap(p => Option(p.observedMetrics.get("graft_curation_gate")))
        .last
      assert(m.getAs[Long]("raw") === 5L)
      assert(m.getAs[Long]("lang_en") === 4L)
      assert(m.getAs[Long]("min_length") === 3L)
      assert(m.getAs[Long]("decontaminated") === 2L)
    } finally q.stop()
  }

  test("corpus-cleaning pipeline runs unchanged under structured streaming") {
    // the batch text surface (cleanse → quality score → PII gate → keep
    // decision) is stateless per-row, so the SAME operator calls compose
    // over a stream — the property that makes the cleaning stages usable
    // in both the backfill and the live-ingest halves of a pipeline
    implicit val ctx = spark.sqlContext
    val docs = MemoryStream[(Long, String)]
    val df = docs.toDF().toDF("doc_id", "text")
    val cleaned = graft.ops.Text.cleanse(df, "text", "doc_id")
      .withColumnRenamed("clean_text", "text")
    val quality = graft.ops.Text.qualityScore(cleaned, "text", "doc_id")
      .select("doc_id", "n_tokens")
    val pii = graft.ops.Text.piiStats(cleaned, "text", "doc_id")
      .select("doc_id", "has_pii")
    val keep = quality.join(pii, "doc_id")
      .select($"doc_id", ($"n_tokens" >= 3 && !$"has_pii").as("keep"))
    val q = keep.writeStream.format("memory").queryName("clean_sink")
      .outputMode("append").start()
    try {
      docs.addData(
        (1L, "the quick <b>brown</b> fox jumps clean and long enough"),
        (2L, "call me at 555-123-4567 about the thing we discussed ok"),
        (3L, "too short"))
      q.processAllAvailable()
      val got = spark.table("clean_sink").as[(Long, Boolean)].collect().toMap
      assert(got === Map(1L -> true, 2L -> false, 3L -> false))
    } finally q.stop()
  }

  test("PII redaction composes over the stream: flagged docs re-enter clean") {
    // redact-instead-of-drop policy: the stream splits on has_pii, redacts
    // the flagged branch, and the re-detected union is PII-free — the
    // keep-the-text variant of the cleaning pipeline, stateless end to end
    implicit val ctx = spark.sqlContext
    val docs = MemoryStream[(Long, String)]
    val df = docs.toDF().toDF("doc_id", "text")
    val redacted = graft.ops.Text.piiRedact(df, "text", "doc_id")
      .withColumnRenamed("text_redacted", "text")
    val recheck = graft.ops.Text.piiStats(redacted, "text", "doc_id")
      .select($"doc_id", $"has_pii")
    val q = recheck.writeStream.format("memory").queryName("redact_sink")
      .outputMode("append").start()
    try {
      docs.addData(
        (1L, "call me at 555-123-4567 or mail a@b.com"),
        (2L, "nothing sensitive here"))
      q.processAllAvailable()
      val got = spark.table("redact_sink").as[(Long, Boolean)].collect().toMap
      assert(got === Map(1L -> false, 2L -> false))
    } finally q.stop()
  }

  test("envelope stream -> decode -> CSAS filter -> update-mode agg") {
    implicit val ctx = spark.sqlContext
    val wire = MemoryStream[String]

    // S5: decode the envelope; corrupt records drop out (P13)
    val decoded = wire.toDF().toDF("env")
      .select(Serdes.fromJsonEnvelope($"env", payloadSchema).as("r"))
      .filter($"r.user".isNotNull)
      .select("r.*")

    // register with pseudo-columns and filter through the SQL surface
    val reg = new StreamRegistry(spark)
    reg.createStream("actions", decoded, keyCol = Some("user"), timeCol = Some("at"),
      timeIsEpochMs = true)
    val clicks = reg.sql(
      "CREATE STREAM clicks AS SELECT ROWKEY, ROWTIME, action FROM actions WHERE action = 'click';")

    val q = clicks.groupBy("ROWKEY").agg(count(lit(1)).as("clicks"))
      .writeStream.format("memory").queryName("pipe_sink").outputMode("update").start()
    try {
      def env(user: String, action: String, at: Long): String =
        Seq((user, action, at)).toDF("user", "action", "at")
          .select(Serdes.toJsonEnvelope(struct($"user", $"action", $"at"), payloadSchema))
          .as[String].head()
      wire.addData(
        env("u1", "click", 1000L), env("u1", "view", 2000L),
        env("u2", "click", 3000L), env("u1", "click", 4000L),
        "corrupt garbage that is not an envelope")
      q.processAllAvailable()
      val counts = spark.table("pipe_sink").groupBy("ROWKEY").agg(max("clicks"))
        .as[(String, Long)].collect().toMap
      assert(counts === Map("u1" -> 2L, "u2" -> 1L))
    } finally q.stop()
  }
}
