package graft

import org.apache.spark.sql.functions._
import graft.ops.Dsir

/** DSIR importance weighting + Gumbel-top-k resampling: the selection
  * signal must point toward the target domain, the weights must be exactly
  * partitioning-independent (the micro-floor discipline), and the resample
  * must be a reproducible without-replacement draw of the right size.
  */
class DsirSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Tables.documents(spark, sf())
  private lazy val target = docs.filter(col("lang") === "en")

  test("weights: every doc scored, en docs average higher than non-en") {
    val rows = Dsir.weights(docs, target, "text", "doc_id").count()
    assert(rows === docs.count())
    val byLang = Dsir.weights(docs, target, "text", "doc_id")
      .join(docs.select("doc_id", "lang"), "doc_id")
      .groupBy(($"lang" === "en").as("is_en"))
      .agg(avg($"weight_micro".cast("double")).as("avg_w"))
      .collect().map(r => r.getBoolean(0) -> r.getDouble(1)).toMap
    assert(byLang(true) > byLang(false),
      s"target-domain docs must score higher: $byLang")
  }

  test("weights are exactly partitioning-independent (micro-floor discipline)") {
    val a = Dsir.weights(docs, target, "text", "doc_id")
      .orderBy("doc_id").collect().toSeq
    val b = Dsir.weights(docs.repartition(7), target.repartition(3),
      "text", "doc_id").orderBy("doc_id").collect().toSeq
    assert(a === b)
  }

  test("empty / null text gets n_feats = 0, weight_micro = 0") {
    val df = Seq((1L, "spark scan join"), (2L, ""), (3L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val w = Dsir.weights(df, df.filter($"doc_id" === 1L), "text", "doc_id")
      .orderBy("doc_id").collect()
    assert(w.length === 3)
    assert(w(1).getLong(1) === 0L && w(1).getLong(2) === 0L)
    assert(w(2).getLong(1) === 0L && w(2).getLong(2) === 0L)
  }

  test("resample keeps ~frac·N docs without replacement, target-shifted") {
    val n = docs.count()
    val kept = Dsir.resample(docs, target, "text", "doc_id", frac = 0.25)
    val ids = kept.select("doc_id").as[Long].collect().toSeq
    // histogram-cut selection: approximate within one bucket width of the
    // exact 25% order statistic (the topFracByClass envelope)
    assert(ids.length >= (0.15 * n).toInt && ids.length <= (0.35 * n).toInt,
      s"kept ${ids.length} of $n")
    assert(ids.distinct.length === ids.length, "without replacement")
    // the kept set must be en-enriched vs the corpus share
    val keptEn = kept.join(docs.select("doc_id", "lang"), "doc_id")
      .filter($"lang" === "en").count().toDouble / ids.length
    val corpusEn = target.count().toDouble / n
    assert(keptEn > corpusEn,
      f"resample must shift toward the target: kept $keptEn%.3f vs corpus $corpusEn%.3f")
  }

  test("scoreWith ≡ batch weights on the fitting corpus (per-row fold == groupBy sum)") {
    val model = Dsir.fit(docs, target, "text", "doc_id", gateFrac = 0.25)
    val served = Dsir.scoreWith(docs, "text", "doc_id", model)
      .select("doc_id", "n_feats", "weight_micro").orderBy("doc_id").collect().toSeq
    val batch = Dsir.weights(docs, target, "text", "doc_id")
      .orderBy("doc_id").collect().toSeq
    assert(served === batch)
  }

  test("model save/load round-trip serves identically; gate keeps ~gateFrac") {
    val dir = "/tmp/graft_dsir_spec_model"
    val model = Dsir.fit(docs, target, "text", "doc_id", gateFrac = 0.25)
    Dsir.save(model, spark, dir)
    val loaded = Dsir.load(spark, dir)
    assert(loaded.buckets === model.buckets && loaded.alpha === model.alpha)
    assert(loaded.cutMicro === model.cutMicro)
    assert(loaded.lam.toSeq === model.lam.toSeq)
    val scored = Dsir.scoreWith(docs, "text", "doc_id", loaded)
    val n = scored.filter($"n_feats" > 0).count()
    val kept = scored.filter($"keep").count()
    assert(kept >= (0.15 * n).toInt && kept <= (0.35 * n).toInt,
      s"gate kept $kept of $n")
    // the gate points at the target: kept set is en-enriched
    val keptEn = scored.filter($"keep")
      .join(docs.select("doc_id", "lang"), "doc_id")
      .filter($"lang" === "en").count().toDouble / kept
    assert(keptEn > target.count().toDouble / docs.count())
  }

  test("scoreWith is stateless: applies unchanged to a stream, batch-equal") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val model = Dsir.fit(docs, target, "text", "doc_id", gateFrac = 0.25)
    val rows = docs.select($"doc_id", $"text").as[(Long, String)]
      .collect().toSeq.take(200)
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[(Long, String)]
    mem.addData(rows: _*)
    val streamed = Dsir.scoreWith(
      mem.toDF().toDF("doc_id", "text"), "text", "doc_id", model)
    val q = streamed.writeStream.format("memory").queryName("dsir_stream")
      .outputMode("append").start()
    try q.processAllAvailable() finally q.stop()
    val got = spark.table("dsir_stream").orderBy("doc_id").collect().toSeq
    val want = Dsir.scoreWith(
      rows.toDF("doc_id", "text"), "text", "doc_id", model)
      .orderBy("doc_id").collect().toSeq
    assert(got === want)
  }

  test("fit on a tokenless corpus yields an admit-nothing gate, not a throw") {
    val empty = Seq((1L, ""), (2L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val model = Dsir.fit(empty, empty, "text", "doc_id")
    assert(model.cutMicro.isPosInfinity)
    // round-trips through parquet, and gates a later NON-empty batch shut
    Dsir.save(model, spark, "/tmp/graft_dsir_spec_empty_model")
    val loaded = Dsir.load(spark, "/tmp/graft_dsir_spec_empty_model")
    assert(loaded.cutMicro.isPosInfinity)
    val scored = Dsir.scoreWith(docs.limit(50), "text", "doc_id", loaded)
    assert(scored.count() === 50 && scored.filter($"keep").count() === 0)
  }

  test("resample is reproducible and frac = 1 keeps every featured doc") {
    val a = Dsir.resample(docs, target, "text", "doc_id", frac = 0.25)
      .orderBy("doc_id").collect().toSeq
    val b = Dsir.resample(docs, target, "text", "doc_id", frac = 0.25)
      .orderBy("doc_id").collect().toSeq
    assert(a === b)
    val all = Dsir.resample(docs, target, "text", "doc_id", frac = 1.0)
    assert(all.count() === Dsir.weights(docs, target, "text", "doc_id")
      .filter($"n_feats" > 0).count())
  }
}
