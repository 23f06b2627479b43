package graft

import org.apache.spark.sql.functions._
import graft.ops.Classifier

/** Hashed-BoW logistic regression: exact distributed training semantics,
  * partition invariance, and actual learning on separable data.
  */
class ClassifierSpec extends SparkSpec {
  import spark.implicits._

  private val toy = Seq(
    (1L, "good solid prose with structure", 1.0),
    (2L, "good clean writing with depth", 1.0),
    (3L, "spam spam click here spam", 0.0),
    (4L, "click spam buy now click", 0.0),
    (5L, "good writing beats spam", 1.0)
  ).toDF("doc_id", "text", "y")

  test("fast sigmoid is bounded, centered, monotone") {
    val zs = Seq(-100.0, -1.0, 0.0, 1.0, 100.0).toDF("z")
      .select(Classifier.sigmoidFast(col("z")).as("p")).as[Double].collect()
    assert(zs(2) == 0.5)
    assert(zs.forall(p => p > 0.0 && p < 1.0))
    assert(zs.sliding(2).forall { case Array(a, b) => a < b; case _ => true })
  }

  test("training separates a separable toy corpus") {
    val w = Classifier.train(toy, "text", "doc_id", col("y") === 1.0,
      buckets = 16, rounds = 4, lr = 1.0)
    val scored = Classifier.score(toy, "text", "doc_id", col("y") === 1.0, w, buckets = 16)
      .as[(Long, Double, Double)].collect()
    val good = scored.filter(_._2 == 1.0).map(_._3)
    val bad = scored.filter(_._2 == 0.0).map(_._3)
    assert(good.min > bad.max,
      s"classifier failed to separate: good=${good.mkString(",")} bad=${bad.mkString(",")}")
  }

  test("weight support is every observed bucket plus the bias row") {
    val w = Classifier.train(toy, "text", "doc_id", col("y") === 1.0,
      buckets = 16, rounds = 1)
    val buckets = w.select("bucket").as[Long].collect().toSet
    val observed = Classifier.hashedFeatures(toy, "text", "doc_id", 16)
      .select("bucket").distinct().as[Long].collect().toSet
    assert(buckets == observed + (-1L))
  }

  test("training is partition-count invariant (integer-exact reductions)") {
    val a = Classifier.train(toy.repartition(1), "text", "doc_id", col("y") === 1.0,
      buckets = 16, rounds = 3)
    val b = Classifier.train(toy.repartition(7), "text", "doc_id", col("y") === 1.0,
      buckets = 16, rounds = 3)
    assert(a.exceptAll(b).count() == 0 && b.exceptAll(a).count() == 0)
  }

  test("empty corpus trains to a zero bias and nothing else") {
    val empty = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], toy.schema)
    val w = Classifier.train(empty, "text", "doc_id", col("y") === 1.0, rounds = 2)
      .as[(Long, Long)].collect()
    assert(w.toSeq == Seq((-1L, 0L)))
  }

  test("lang-id proxy is learnable on the real corpus (separation in means)") {
    val d = Tables.documents(spark, sf("sf0.01"))
    val w = Classifier.train(d, "text", "doc_id", col("lang") === "en",
      buckets = 32, rounds = 2, lr = 0.5)
    val s = Classifier.score(d, "text", "doc_id", col("lang") === "en", w, buckets = 32)
    val m = s.groupBy("y").agg(avg("score").as("m")).orderBy("y")
      .as[(Double, Double)].collect().toMap
    assert(m(1.0) > m(0.0),
      s"en-mean ${m(1.0)} should exceed non-en mean ${m(0.0)} after training")
  }

  test("per-row model-serving scorer is bit-identical to the relational scorer") {
    val d = Tables.documents(spark, sf("sf0.01"))
    val w = Classifier.train(d, "text", "doc_id", col("lang") === "en",
      buckets = 32, rounds = 2, lr = 0.5)
    val relational = Classifier.score(d, "text", "doc_id", col("lang") === "en", w, 32)
      .select("doc_id", "score")
    val perRow = Classifier.scoreWithModel(d, "text", "doc_id", w, 32)
    assert(relational.exceptAll(perRow).count() == 0 &&
      perRow.exceptAll(relational).count() == 0)
  }

  test("model serving scores a document STREAM in append mode, no state") {
    implicit val ctx = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val w = Classifier.train(toy, "text", "doc_id", col("y") === 1.0,
      buckets = 16, rounds = 4, lr = 1.0)
    val input = MemoryStream[(Long, String)]
    val q = Classifier.scoreWithModel(
        input.toDF().toDF("doc_id", "text"), "text", "doc_id", w, 16)
      .writeStream.format("memory").queryName("clf_stream")
      .outputMode("append").start()
    try {
      val docs = toy.select("doc_id", "text").as[(Long, String)].collect()
      input.addData(docs.take(2): _*); q.processAllAvailable()
      input.addData(docs.drop(2): _*); q.processAllAvailable()
      val streamed = spark.table("clf_stream").as[(Long, Double)].collect().toMap
      val batch = Classifier.scoreWithModel(toy, "text", "doc_id", w, 16)
        .as[(Long, Double)].collect().toMap
      assert(streamed == batch)
      assert(q.lastProgress == null ||
        Option(q.lastProgress.stateOperators).forall(_.isEmpty),
        "model serving must be stateless")
    } finally q.stop()
  }

  test("xxhash production path: train/score/serve stay mutually consistent") {
    // the non-portable hash can't be oracle-checked; pin that the three
    // surfaces agree with each other and the model still separates
    val w = Classifier.train(toy, "text", "doc_id", col("y") === 1.0,
      buckets = 16, rounds = 4, lr = 1.0, portableHash = false)
    val rel = Classifier.score(toy, "text", "doc_id", col("y") === 1.0, w, 16,
      portableHash = false).select("doc_id", "score")
    val srv = Classifier.scoreWithModel(toy, "text", "doc_id", w, 16,
      portableHash = false)
    assert(rel.exceptAll(srv).count() == 0 && srv.exceptAll(rel).count() == 0)
    val scored = rel.join(toy.select("doc_id", "y"), "doc_id")
      .as[(Long, Double, Double)].collect()
    assert(scored.filter(_._3 == 1.0).map(_._2).min >
      scored.filter(_._3 == 0.0).map(_._2).max)
  }

  test("aucExact: hand-computed pairs, ties at half credit, degenerate null") {
    import spark.implicits._
    def auc(rows: Seq[(Double, Int)]): Option[Long] = {
      val r = Classifier.aucExact(rows.toDF("score", "y"), "score", "y").head()
      if (r.isNullAt(2)) None else Some(r.getLong(2))
    }
    // pairs: 0.9>0.8 ✓, 0.9>0.1 ✓, 0.7<0.8 ✗, 0.7>0.1 ✓ → 3/4
    assert(auc(Seq((0.9, 1), (0.7, 1), (0.8, 0), (0.1, 0))) === Some(750000L))
    assert(auc(Seq((0.5, 1), (0.5, 0))) === Some(500000L))        // pure tie → ½
    assert(auc(Seq((0.9, 1), (0.1, 0))) === Some(1000000L))       // perfect
    assert(auc(Seq((0.1, 1), (0.9, 0))) === Some(0L))             // inverted
    assert(auc(Seq((0.9, 1), (0.8, 1))) === None)                 // one class
    // null LABELS are excluded, not counted as negatives: a null-y row must
    // not change n_neg or the AUC (the DuckDB mirror's FILTER (y <> 1)
    // skips NULL, so counting it as negative would split the engines)
    val withNull = Seq((0.9, Some(1)), (0.7, Some(1)), (0.8, Some(0)),
      (0.1, Some(0)), (0.65, None: Option[Int])).toDF("score", "y")
    val rn = Classifier.aucExact(withNull, "score", "y").head()
    assert((rn.getLong(0), rn.getLong(1), rn.getLong(2)) === ((2L, 2L, 750000L)))
    // the trained model on the real corpus separates better than chance
    val d = Tables.documents(spark, sf())
    val w = Classifier.train(d, "text", "doc_id", col("lang") === "en", rounds = 2)
    val scored = Classifier.score(d, "text", "doc_id", col("lang") === "en", w)
    val corpusAuc = Classifier.aucExact(scored, "score", "y").head().getLong(2)
    assert(corpusAuc > 500000L, s"AUC $corpusAuc should beat chance")
  }

  test("prCurve: exact cumulative points from the top of the histogram") {
    import spark.implicits._
    // scores desc: 0.9(+), 0.8(−), 0.7(+), 0.1(−) → points:
    // t=0.9: tp1 fp0 p=1.0 r=0.5 | t=0.8: tp1 fp1 p=0.5 r=0.5
    // t=0.7: tp2 fp1 p=666666µ r=1.0 | t=0.1: tp2 fp2 p=0.5 r=1.0
    val d = Seq((0.9, 1), (0.7, 1), (0.8, 0), (0.1, 0)).toDF("score", "y")
    val pts = Classifier.prCurve(d, "score", "y")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(pts(900000L) === ((1L, 0L, 1000000L, 500000L)))
    assert(pts(800000L) === ((1L, 1L, 500000L, 500000L)))
    assert(pts(700000L) === ((2L, 1L, 666666L, 1000000L)))
    assert(pts(100000L) === ((2L, 2L, 500000L, 1000000L)))
    // a null-label row contributes no point and no tp/fp mass
    val dn = Seq((0.9, Some(1)), (0.7, Some(1)), (0.8, Some(0)), (0.1, Some(0)),
      (0.65, None: Option[Int])).toDF("score", "y")
    val ptsN = Classifier.prCurve(dn, "score", "y")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(ptsN === pts)
  }

  test("calibrationBins: exact per-decile confidence vs observed rate") {
    import spark.implicits._
    // band 9: scores .95/.91, one positive → mean 930000µ, rate 500000µ
    // band 0: score .05 negative; score 1.0 clamps into band 9
    val d = Seq((0.95, 1), (0.91, 0), (0.05, 0), (1.0, 1)).toDF("score", "y")
    val bins = Classifier.calibrationBins(d, "score", "y", bands = 10)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(bins(9L) === ((3L, 2L, (950000L + 910000L + 1000000L) / 3, 666666L)))
    assert(bins(0L) === ((1L, 0L, 50000L, 0L)))
    assert(bins.size === 2)
    // a null-label row is excluded from its band entirely (n AND rate)
    val dn = Seq((0.95, Some(1)), (0.91, Some(0)), (0.05, Some(0)),
      (1.0, Some(1)), (0.93, None: Option[Int])).toDF("score", "y")
    val binsN = Classifier.calibrationBins(dn, "score", "y", bands = 10)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(binsN === bins)
  }

  test("online calibration monitor: observed per-batch sums ≡ the batch bins") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val d = Tables.documents(spark, sf())
    val w = Classifier.train(d, "text", "doc_id", col("lang") === "en", rounds = 1)
    val rows = d.select(col("doc_id"), col("text"),
        (col("lang") === "en").cast("int").as("y"))
      .as[(Long, String, Int)].collect().toSeq
    val (b1, b2) = rows.splitAt(rows.size / 2)
    val in = MemoryStream[(Long, String, Int)]
    val scored = Classifier.scoreWithModel(
      in.toDF().toDF("doc_id", "text", "y"), "text", "doc_id", w,
      keepCols = Seq("y"))
    val q = graft.streaming.ModelMonitor.observedCalibration(
        scored, "score", "y", bands = 10, name = "clf_mon")
      .writeStream.format("noop").outputMode("append").start()
    try {
      in.addData(b1: _*); q.processAllAvailable()
      in.addData(b2: _*); q.processAllAvailable()
      val ms = q.recentProgress
        .flatMap(p => Option(p.observedMetrics.get("clf_mon")))
      assert(ms.nonEmpty)
      def summed(field: String): Long = ms.map(_.getAs[Long](field)).sum
      val batch = Classifier.calibrationBins(
          Classifier.scoreWithModel(d, "text", "doc_id", w)
            .join(d.select(col("doc_id"), (col("lang") === "en").cast("int").as("y")), "doc_id"),
          "score", "y", bands = 10)
        .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
      batch.foreach { case (b, (n, pos)) =>
        assert(summed(s"b${b}_n") === n, s"band $b n")
        assert(summed(s"b${b}_pos") === pos, s"band $b pos")
      }
    } finally q.stop()
  }

  test("online calibration monitor excludes null-label rows like the batch bins") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    // same fixture as the calibrationBins null test: the 0.93 null-label
    // row must vanish from ALL THREE band-9 metrics (n, pos, ssum), not
    // only the pos count — the batch ≡ streaming invariant with unlabeled
    // rows present
    val in = MemoryStream[(Double, Option[Int])]
    val q = graft.streaming.ModelMonitor.observedCalibration(
        in.toDF().toDF("score", "y"), "score", "y", bands = 10, name = "mon_null")
      .writeStream.format("noop").outputMode("append").start()
    try {
      in.addData((0.95, Some(1)), (0.91, Some(0)), (0.05, Some(0)),
        (1.0, Some(1)), (0.93, None: Option[Int]))
      q.processAllAvailable()
      val m = q.recentProgress
        .flatMap(p => Option(p.observedMetrics.get("mon_null"))).last
      assert(m.getAs[Long]("b9_n") === 3L)
      assert(m.getAs[Long]("b9_pos") === 2L)
      assert(m.getAs[Long]("b9_ssum") === 950000L + 910000L + 1000000L)
      assert(m.getAs[Long]("b0_n") === 1L)
      assert(m.getAs[Long]("b0_ssum") === 50000L)
    } finally q.stop()
  }

  test("model lifecycle: save → load → serve equals the in-session model") {
    val d = Tables.documents(spark, sf())
    val w = Classifier.train(d, "text", "doc_id", col("lang") === "en", rounds = 1)
    val dir = java.nio.file.Files.createTempDirectory("clf-model").toString
    Classifier.save(w, s"$dir/weights.parquet")
    val loaded = Classifier.load(spark, s"$dir/weights.parquet")
    val direct = Classifier.scoreWithModel(d, "text", "doc_id", w)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val replayed = Classifier.scoreWithModel(d, "text", "doc_id", loaded)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(replayed === direct)
  }

  test("training plan: weights broadcast; corpus is never re-shuffled per round") {
    val d = Tables.documents(spark, sf())
    val w = Classifier.train(d, "text", "doc_id", col("lang") === "en", rounds = 1)
    val p = Classifier.score(d, "text", "doc_id", col("lang") === "en", w)
      .queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(!p.contains("CartesianProduct"))
    assert(p.contains("BroadcastHashJoin"), "weight join must broadcast")
  }

  // r22 kernel ≡ reference pin (the GramHashes/SumLam discipline): the
  // native serving fold must equal the interpreted column form it
  // replaced, value for value, on the real corpus and on the edges —
  // null text, tokenless text, both hash layouts, empty/bias-only model
  test("serving z_micro kernel equals the column reference form") {
    import org.apache.spark.sql.graft.ClfZSum
    val d = Tables.documents(spark, sf()).toDF()
      .unionByName(Seq(
        (900001L, null.asInstanceOf[String]),
        (900002L, ""),
        (900003L, "  .,;!  "),
        (900004L, "café naïve 😀 café"),
        (900005L, "x")
      ).toDF("doc_id", "text"), allowMissingColumns = true)
    val w = Classifier.train(Tables.documents(spark, sf()), "text", "doc_id",
      col("lang") === "en", buckets = 32, rounds = 2)
    val wm = w.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    for (portable <- Seq(true, false);
         m <- Seq(wm, Map(-1L -> 123456L), Map.empty[Long, Long])) {
      val dense = Array.fill(32)(0L)
      m.removed(-1L).foreach { case (b, v) =>
        if (b >= 0 && b < 32) dense(b.toInt) = v }
      val bias = m.getOrElse(-1L, 0L)
      val got = d.select(col("doc_id"),
        (ClfZSum.clfZSum(col("text"), dense.toSeq, portable) + lit(bias)).as("z"))
      val ref = d.select(col("doc_id"),
        Classifier.zMicroRef("text", m, 32, portable).as("z"))
      assert(got.exceptAll(ref).isEmpty && ref.exceptAll(got).isEmpty,
        s"kernel diverges from reference (portable=$portable, model=$m)")
    }
  }
}
