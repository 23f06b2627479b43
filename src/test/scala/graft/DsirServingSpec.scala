package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.ops.Dsir
import graft.streaming.DsirServing

/** The hot-reloading streaming DSIR gate: a republish mid-stream takes
  * effect at the next micro-batch — batches cleanly pre/post, never a
  * mixed λ/cutoff, zero refusals, no query restart.
  */
class DsirServingSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Tables.documents(spark, sf())
  private lazy val target = docs.filter(col("lang") === "en")

  private def fs = new org.apache.hadoop.fs.Path("/tmp")
    .getFileSystem(spark.sparkContext.hadoopConfiguration)

  test("a live stream picks up a republished model at the next batch: pre-batches " +
      "score with the old model, post-batches with the new, zero refusals") {
    val dir = "/tmp/graft_dsir_serving_spec"
    fs.delete(new org.apache.hadoop.fs.Path(dir), true)
    val modelA = Dsir.fit(docs, target, "text", "doc_id", gateFrac = 0.25)
    val modelB = Dsir.fit(docs, docs.filter($"lang" === "de"), "text", "doc_id",
      gateFrac = 0.5)
    assert(modelA.lam.toSeq !== modelB.lam.toSeq)
    Dsir.save(modelA, spark, dir)

    val rows = docs.select($"doc_id", $"text").as[(Long, String)]
      .collect().toSeq.take(200)
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[(Long, String)]

    // collect every scored row tagged with its batch id; count swaps
    val got = new scala.collection.mutable.ArrayBuffer[(Long, Long, Long)]() // (batch, doc, w)
    val swaps = new java.util.concurrent.atomic.AtomicInteger(0)
    val gate = DsirServing.gatedForeachBatch(dir, "text", "doc_id",
      onSwap = (_, _) => swaps.incrementAndGet()) { (scored, batchId) =>
      got.synchronized {
        got ++= scored.select(col("doc_id"), col("weight_micro"))
          .collect().map(r => (batchId, r.getLong(0), r.getLong(1)))
      }
    }
    val q = mem.toDF().toDF("doc_id", "text")
      .writeStream.foreachBatch(gate).start()
    try {
      // batch with model A published
      mem.addData(rows.take(100): _*)
      q.processAllAvailable()
      // republish mid-stream: NO restart, next batch must serve B
      Dsir.save(modelB, spark, dir)
      mem.addData(rows.drop(100): _*)
      q.processAllAvailable()
    } finally q.stop()

    val preBatch = got.filter(_._1 == 0).map(t => t._2 -> t._3).toMap
    val postBatch = got.filter(_._1 == 1).map(t => t._2 -> t._3).toMap
    assert(preBatch.size === 100 && postBatch.size === 100,
      s"every record scored exactly once: ${preBatch.size}/${postBatch.size}")
    def expect(model: Dsir.DsirModel, slice: Seq[(Long, String)]): Map[Long, Long] =
      Dsir.scoreWith(slice.toDF("doc_id", "text"), "text", "doc_id", model)
        .select("doc_id", "weight_micro").collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(preBatch === expect(modelA, rows.take(100)),
      "records scored BEFORE the republish must use the old model")
    assert(postBatch === expect(modelB, rows.drop(100)),
      "records scored AFTER the republish must use the new model")
    // exactly two reloads: the initial load and the republish pickup
    assert(swaps.get() === 2, s"expected 2 model swaps, saw ${swaps.get()}")
  }

  test("multi-gate router hot-reloads ONE domain independently: the republished " +
      "gate swaps at the next batch, the others keep their cached models") {
    val dirEn = "/tmp/graft_dsir_serving_multi_en"
    val dirDe = "/tmp/graft_dsir_serving_multi_de"
    Seq(dirEn, dirDe).foreach(d => fs.delete(new org.apache.hadoop.fs.Path(d), true))
    val fits = Dsir.fitPerDomain(docs,
      Seq("en" -> target, "de" -> docs.filter($"lang" === "de")),
      "text", "doc_id", gateFrac = 0.25)
    Dsir.save(fits("en"), spark, dirEn)
    Dsir.save(fits("de"), spark, dirDe)
    // the republished de-gate: same (buckets, alpha) — a different cutoff
    val deV2 = fits("de").copy(cutMicro = fits("de").cutMicro + 1e9)

    val rows = docs.select($"doc_id", $"text").as[(Long, String)]
      .collect().toSeq.take(100)
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[(Long, String)]
    val swapsByDomain = new java.util.concurrent.ConcurrentHashMap[String, Integer]()
    val got = new scala.collection.mutable.ArrayBuffer[(Long, Long, Boolean, Boolean)]()
    val gate = DsirServing.multiGatedForeachBatch(
      Seq("en" -> dirEn, "de" -> dirDe), "text", "doc_id",
      onSwap = (d, _, _) => swapsByDomain.merge(d, 1, (a, b) => a + b)) {
      (scored, batchId) =>
        got.synchronized {
          got ++= scored.select(col("doc_id"), col("keep_en"), col("keep_de"))
            .collect().map(r => (batchId, r.getLong(0),
              r.getBoolean(1), r.getBoolean(2)))
        }
    }
    val q = mem.toDF().toDF("doc_id", "text")
      .writeStream.foreachBatch(gate).start()
    try {
      mem.addData(rows.take(50): _*)
      q.processAllAvailable()
      Dsir.save(deV2, spark, dirDe) // republish ONLY the de gate
      mem.addData(rows.drop(50): _*)
      q.processAllAvailable()
    } finally q.stop()

    def expect(ms: Seq[(String, Dsir.DsirModel)], slice: Seq[(Long, String)]) =
      Dsir.scoreWithMany(slice.toDF("doc_id", "text"), "text", "doc_id", ms)
        .select(col("doc_id"), col("keep_en"), col("keep_de")).collect()
        .map(r => (r.getLong(0), r.getBoolean(1), r.getBoolean(2))).toSet
    val pre = got.filter(_._1 == 0).map(t => (t._2, t._3, t._4)).toSet
    val post = got.filter(_._1 == 1).map(t => (t._2, t._3, t._4)).toSet
    assert(pre === expect(Seq("en" -> fits("en"), "de" -> fits("de")),
      rows.take(50)), "pre-republish batch must use both original models")
    assert(post === expect(Seq("en" -> fits("en"), "de" -> deV2),
      rows.drop(50)), "post-republish batch must swap ONLY the de gate")
    // the +1e9 cutoff shuts the de gate post-republish: visible evidence
    // the swap landed (and that en was untouched)
    assert(got.filter(_._1 == 1).forall(!_._4), "deV2 admits nothing")
    assert(swapsByDomain.get("en") === 1, "en must load once, never reload")
    assert(swapsByDomain.get("de") === 2, "de must reload exactly once")
  }

  test("steady state reloads nothing: the generation token gates the parquet read") {
    val dir = "/tmp/graft_dsir_serving_spec_steady"
    fs.delete(new org.apache.hadoop.fs.Path(dir), true)
    val model = Dsir.fit(docs, target, "text", "doc_id", gateFrac = 0.25)
    Dsir.save(model, spark, dir)
    val swaps = new java.util.concurrent.atomic.AtomicInteger(0)
    val hot = new DsirServing.HotModel(dir, (_, _) => swaps.incrementAndGet())
    val m1 = hot.currentFor(spark)
    (1 to 5).foreach(_ => hot.currentFor(spark))
    assert(swaps.get() === 1, "unchanged generation must not reload")
    assert(m1.lam.toSeq === model.lam.toSeq)
    // a republish moves the generation exactly once more
    Dsir.save(model.copy(cutMicro = model.cutMicro + 1.0), spark, dir)
    val m2 = hot.currentFor(spark)
    (1 to 5).foreach(_ => hot.currentFor(spark))
    assert(swaps.get() === 2)
    assert(m2.cutMicro === model.cutMicro + 1.0)
  }
}
