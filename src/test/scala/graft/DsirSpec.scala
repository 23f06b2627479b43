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

  test("native feature/fold kernels ≡ interpreted column reference forms") {
    // r21 kernels (DsirFeatBuckets + SumLam) vs the r20 column chain:
    // identical (id, n_feats, weight_micro) and identical multi-domain
    // weight columns — on the real corpus AND the degenerate edges the
    // coalesce/greatest wrappers exist for
    val edge = Seq[(Long, String)](1L -> null, 2L -> "", 3L -> "one",
      4L -> "one two", 5L -> "repeat repeat repeat", 6L -> "Thé QUICK brown-fox.")
      .toDF("doc_id", "text")
    val lamA = Array.tabulate(64)(i => (i * 37 - 1000).toLong)
    val lamB = Array.tabulate(64)(i => (5000 - i * 91).toLong)
    for (d <- Seq(edge, docs.toDF())) {
      val k1 = Dsir.scoredCols(d, "text", "doc_id", lamA, 64)
      val r1 = Dsir.scoredColsRef(d, "text", "doc_id", lamA, 64)
      assert(k1.exceptAll(r1).isEmpty && r1.exceptAll(k1).isEmpty,
        "scoredCols kernel/reference divergence")
      val lams = Seq("a" -> lamA, "b" -> lamB)
      val k2 = Dsir.multiScoredCols(d, "text", "doc_id", lams, 64)
      val r2 = Dsir.multiScoredColsRef(d, "text", "doc_id", lams, 64)
      assert(k2.exceptAll(r2).isEmpty && r2.exceptAll(k2).isEmpty,
        "multiScoredCols kernel/reference divergence")
    }
    // the exploded fit-side features: same (id, bucket) multiset
    val kf = Dsir.features(docs.toDF(), "text", "doc_id", 64)
      .groupBy("doc_id", "b").count()
    val rf = docs.select(col("doc_id"), graft.ops.Text.tokens(col("text")).as("ts"))
      .select(col("doc_id"), explode(expr(
        "concat(ts, case when size(ts) >= 2 then transform(sequence(0, size(ts) - 2), i -> concat(ts[i], ' ', ts[i + 1])) else cast(array() as array<string>) end)")).as("f"))
      .select(col("doc_id"), pmod(graft.ops.Text.h32(col("f")), lit(64)).as("b"))
      .groupBy("doc_id", "b").count()
    assert(kf.exceptAll(rf).isEmpty && rf.exceptAll(kf).isEmpty,
      "features kernel/reference divergence")
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

  test("weightsPerDomain: every domain column equals its single-target weights run") {
    val targets = Seq("en", "de").map(l => l -> docs.filter($"lang" === l))
    val multi = Dsir.weightsPerDomain(docs, targets, "text", "doc_id")
    assert(multi.columns.toSeq === Seq("doc_id", "n_feats", "w_en", "w_de"))
    for ((l, t) <- targets) {
      val fromMulti = multi
        .select($"doc_id", $"n_feats", col(s"w_$l").as("weight_micro"))
        .orderBy("doc_id").collect().toSeq
      val single = Dsir.weights(docs, t, "text", "doc_id")
        .orderBy("doc_id").collect().toSeq
      assert(fromMulti === single, s"domain $l diverges from the single-target op")
    }
  }

  test("fitPerDomain: every domain's model is EXACTLY the single-target fit") {
    val targets = Seq("en", "de").map(l => l -> docs.filter($"lang" === l))
    val many = Dsir.fitPerDomain(docs, targets, "text", "doc_id", gateFrac = 0.25)
    assert(many.keySet === Set("en", "de"))
    for ((l, t) <- targets) {
      val single = Dsir.fit(docs, t, "text", "doc_id", gateFrac = 0.25)
      assert(many(l).lam.toSeq === single.lam.toSeq, s"λ diverges for $l")
      assert(many(l).cutMicro === single.cutMicro, s"cutoff diverges for $l")
      assert(many(l).buckets === single.buckets && many(l).alpha === single.alpha)
    }
    // the fit lifecycle discipline: nothing cached survives the call
    val before = spark.sparkContext.getPersistentRDDs.keySet
    Dsir.fitPerDomain(docs, targets, "text", "doc_id")
    assert((spark.sparkContext.getPersistentRDDs.keySet -- before).isEmpty)
  }

  test("scoreWithMany: one projection serves every gate, equal to per-model scoreWith, " +
      "stream-safe") {
    val targets = Seq("en", "de").map(l => l -> docs.filter($"lang" === l))
    val models = Dsir.fitPerDomain(docs, targets, "text", "doc_id", gateFrac = 0.25)
    val ordered = Seq("en", "de").map(l => l -> models(l))
    val many = Dsir.scoreWithMany(docs, "text", "doc_id", ordered)
    assert(many.columns.toSeq ===
      Seq("doc_id", "n_feats", "w_en", "w_de", "keep_en", "keep_de"))
    for ((l, m) <- ordered) {
      val fromMany = many.select($"doc_id", $"n_feats",
        col(s"w_$l").as("weight_micro"), col(s"keep_$l").as("keep"))
        .orderBy("doc_id").collect().toSeq
      val single = Dsir.scoreWith(docs, "text", "doc_id", m)
        .orderBy("doc_id").collect().toSeq
      assert(fromMany === single, s"gate $l diverges from scoreWith")
    }
    // mixed-parameter models refuse (the shared-hash contract)
    val odd = Dsir.fit(docs, targets.head._2, "text", "doc_id", buckets = 512)
    intercept[IllegalArgumentException] {
      Dsir.scoreWithMany(docs, "text", "doc_id", Seq("en" -> models("en"), "odd" -> odd))
    }
    // stateless: the multi-gate applies unchanged to a stream
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val rows = docs.select($"doc_id", $"text").as[(Long, String)]
      .collect().toSeq.take(100)
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[(Long, String)]
    mem.addData(rows: _*)
    val q = Dsir.scoreWithMany(mem.toDF().toDF("doc_id", "text"),
      "text", "doc_id", ordered)
      .writeStream.format("memory").queryName("dsir_multi_stream")
      .outputMode("append").start()
    try q.processAllAvailable() finally q.stop()
    val got = spark.table("dsir_multi_stream").orderBy("doc_id").collect().toSeq
    val want = Dsir.scoreWithMany(rows.toDF("doc_id", "text"),
      "text", "doc_id", ordered).orderBy("doc_id").collect().toSeq
    assert(got === want)
  }

  private def fs = new org.apache.hadoop.fs.Path("/tmp")
    .getFileSystem(spark.sparkContext.hadoopConfiguration)
  private def hp(s: String) = new org.apache.hadoop.fs.Path(s)

  test("save publishes atomically: a crash between the two renames refuses loudly, " +
      "never serves a mixed model; the next save heals") {
    val dir = "/tmp/graft_dsir_spec_atomic"
    fs.delete(hp(dir), true)
    val modelA = Dsir.fit(docs, target, "text", "doc_id", gateFrac = 0.25)
    Dsir.save(modelA, spark, dir)
    // forge the crash window between rename-away and rename-in: current/
    // moved aside, staging never published (the OLD silent window was
    // new-lambda/old-cutoff; here the reader must refuse instead)
    assert(fs.rename(hp(s"$dir/current"), hp(s"$dir/_graft_prev_forged")))
    val e = intercept[IllegalStateException](Dsir.load(spark, dir))
    assert(e.getMessage.contains("crashed mid-publish"))
    assert(e.getMessage.contains("_graft_prev_forged"))
    // save is the write path: it heals the debris and publishes cleanly
    val modelB = Dsir.fit(docs, target, "text", "doc_id", gateFrac = 0.5)
    Dsir.save(modelB, spark, dir)
    val loaded = Dsir.load(spark, dir)
    assert(loaded.cutMicro === modelB.cutMicro)
    assert(loaded.lam.toSeq === modelB.lam.toSeq)
    // no debris survives a successful publish (the claim/generation
    // tokens are part of the protocol, not debris)
    val names = fs.listStatus(hp(dir)).map(_.getPath.getName).toSet
    assert(names === Set("current", "_graft_pubclaim", "_graft_pubgen"),
      s"leftover debris: $names")
  }

  test("load ignores staging debris and serves the intact committed model") {
    val dir = "/tmp/graft_dsir_spec_staging_debris"
    fs.delete(hp(dir), true)
    val modelA = Dsir.fit(docs, target, "text", "doc_id", gateFrac = 0.25)
    Dsir.save(modelA, spark, dir)
    // forge a publisher that crashed BEFORE its commit rename: a complete
    // staged model (different content) next to the committed one
    val modelB = modelA.copy(cutMicro = modelA.cutMicro + 42.0)
    val other = "/tmp/graft_dsir_spec_staging_debris_other"
    fs.delete(hp(other), true)
    Dsir.save(modelB, spark, other)
    assert(fs.rename(hp(s"$other/current"), hp(s"$dir/_graft_staging_forged")))
    assert(Dsir.load(spark, dir).cutMicro === modelA.cutMicro)
  }

  test("load refuses a truncated lambda table instead of silently under-scoring") {
    val dir = "/tmp/graft_dsir_spec_truncated"
    fs.delete(hp(dir), true)
    val model = Dsir.fit(docs, target, "text", "doc_id", gateFrac = 0.25)
    Dsir.save(model, spark, dir)
    // forge a partial lambda: rewrite it with half the rows (meta intact)
    val half = spark.read.parquet(s"$dir/current/lambda")
      .filter($"b" < model.buckets / 2)
    val tmp = "/tmp/graft_dsir_spec_truncated_half"
    half.coalesce(1).write.mode("overwrite").parquet(tmp)
    fs.delete(hp(s"$dir/current/lambda"), true)
    assert(fs.rename(hp(tmp), hp(s"$dir/current/lambda")))
    val e = intercept[IllegalArgumentException](Dsir.load(spark, dir))
    assert(e.getMessage.contains(s"of ${model.buckets} buckets"))
  }

  test("load refuses the pre-r18 unversioned layout with a re-save pointer") {
    val dir = "/tmp/graft_dsir_spec_legacy"
    fs.delete(hp(dir), true)
    val model = Dsir.fit(docs, target, "text", "doc_id", gateFrac = 0.25)
    Dsir.save(model, spark, dir)
    // forge the old layout: flat lambda/ + meta/ at the top level
    assert(fs.rename(hp(s"$dir/current/lambda"), hp(s"$dir/lambda")))
    assert(fs.rename(hp(s"$dir/current/meta"), hp(s"$dir/meta")))
    fs.delete(hp(s"$dir/current"), true)
    val e = intercept[IllegalStateException](Dsir.load(spark, dir))
    assert(e.getMessage.contains("pre-atomic unversioned layout"))
    // re-save adopts the atomic layout AND clears the flat tables
    Dsir.save(model, spark, dir)
    assert(Dsir.load(spark, dir).lam.toSeq === model.lam.toSeq)
    val names = fs.listStatus(hp(dir)).map(_.getPath.getName).toSet
    assert(names === Set("current", "_graft_pubclaim", "_graft_pubgen"),
      s"legacy tables not cleared: $names")
  }

  test("single-publisher contract is ENFORCED: a competing publish that lands " +
      "mid-save makes the slower save refuse loudly; the winner is complete") {
    val dir = "/tmp/graft_dsir_spec_concurrent_pub"
    fs.delete(hp(dir), true)
    val modelA = Dsir.fit(docs, target, "text", "doc_id", gateFrac = 0.25)
    Dsir.save(modelA, spark, dir)
    val modelB = Dsir.fit(docs, docs.filter($"lang" === "de"), "text", "doc_id",
      gateFrac = 0.5)
    val modelC = modelA.copy(cutMicro = modelA.cutMicro + 99.0)
    // forge the interleaving: while C's save is between its staging writes
    // and its commit, B claims AND fully publishes
    val e = intercept[java.util.ConcurrentModificationException] {
      Dsir.save(modelC, spark, dir, beforeCommit =
        () => Dsir.save(modelB, spark, dir))
    }
    assert(e.getMessage.contains("concurrent DSIR publish"))
    // the surviving publisher's model is COMPLETE — never a C/B mix
    val loaded = Dsir.load(spark, dir)
    assert(loaded.lam.toSeq === modelB.lam.toSeq)
    assert(loaded.cutMicro === modelB.cutMicro)
    // the loser's staging never leaks
    val names = fs.listStatus(hp(dir)).map(_.getPath.getName).toSet
    assert(!names.exists(_.startsWith("_graft_staging_")), s"staging leaked: $names")
  }

  test("a load whose reads straddle a concurrent publish retries and serves a " +
      "COMPLETE model — never new-lambda/stale-cutoff") {
    val dir = "/tmp/graft_dsir_spec_load_race"
    fs.delete(hp(dir), true)
    val modelA = Dsir.fit(docs, target, "text", "doc_id", gateFrac = 0.25)
    val modelB = Dsir.fit(docs, docs.filter($"lang" === "de"), "text", "doc_id",
      gateFrac = 0.5)
    assert(modelA.lam.toSeq !== modelB.lam.toSeq)
    assert(modelA.cutMicro !== modelB.cutMicro)
    Dsir.save(modelA, spark, dir)
    // forge the race: a full publish of B lands EXACTLY between load's
    // meta read and its lambda read (single-shot — retries read cleanly)
    val fired = new java.util.concurrent.atomic.AtomicBoolean(false)
    val loaded = Dsir.load(spark, dir, afterMetaRead = () =>
      if (fired.compareAndSet(false, true)) Dsir.save(modelB, spark, dir))
    // the pre-fix behavior was modelA's cutoff with modelB's lambda; the
    // generation re-check forces a clean retry, which serves B entirely
    assert(loaded.lam.toSeq === modelB.lam.toSeq)
    assert(loaded.cutMicro === modelB.cutMicro)
  }

  test("save keeps a crashed predecessor's prev copy until its own commit succeeds") {
    val dir = "/tmp/graft_dsir_spec_prev_kept"
    fs.delete(hp(dir), true)
    val modelA = Dsir.fit(docs, target, "text", "doc_id", gateFrac = 0.25)
    Dsir.save(modelA, spark, dir)
    // forge a predecessor that crashed between its two renames: the prev
    // copy is the ONLY intact model anywhere
    assert(fs.rename(hp(s"$dir/current"), hp(s"$dir/_graft_prev_crashed")))
    // a save that dies BEFORE its commit (forged via the seam) must leave
    // that prev copy on disk — deleting it up front would strand the path
    // with no model at all
    intercept[RuntimeException] {
      Dsir.save(modelA, spark, dir, beforeCommit =
        () => throw new RuntimeException("forged staging-phase death"))
    }
    val names = fs.listStatus(hp(dir)).map(_.getPath.getName).toSet
    assert(names.contains("_graft_prev_crashed"),
      s"the only intact model copy was deleted before commit: $names")
    // and a save that SUCCEEDS clears it (superseded)
    Dsir.save(modelA, spark, dir)
    val after = fs.listStatus(hp(dir)).map(_.getPath.getName).toSet
    assert(!after.exists(_.startsWith("_graft_prev_")), s"prev not cleared: $after")
    assert(Dsir.load(spark, dir).lam.toSeq === modelA.lam.toSeq)
  }

  test("resample leaves no cached blocks behind once the result is released") {
    val before = spark.sparkContext.getPersistentRDDs.keySet
    val kept = Dsir.resample(docs, target, "text", "doc_id", frac = 0.25)
    kept.count() // consume
    // the (id, key) weight cache is released before resample returns; the
    // only surviving storage is the materialized RESULT, which the caller
    // owns and can reclaim immediately
    graft.ops.Lineage.release(kept)
    val leaked = spark.sparkContext.getPersistentRDDs.keySet -- before
    assert(leaked.isEmpty, s"resample leaked cached RDDs: $leaked")
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
