package graft

import org.apache.spark.sql.functions._
import graft.ops.Stats

/** The histogram percentile estimator: within-bucket-width of the exact
  * percentile on real data, exact on degenerate groups, and bounded-state
  * by construction (plan guard lives in PlanSpec).
  */
class StatsSpec extends SparkSpec {
  import spark.implicits._

  test("histogram estimate is within one bucket width of the rank-⌈p·n⌉ order statistic") {
    val e = Tables.events(spark, sf()).filter(col("value").isNotNull)
    val est = Stats.histogramPercentiles(e, "event_type", "value",
      Seq(("50", 0.5), ("95", 0.95)), buckets = 256)
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    val grouped = e.select(col("event_type"), col("value")).as[(String, Double)]
      .collect().groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    grouped.foreach { case (g, vs) =>
      val width = (vs.last - vs.head) / 256.0
      // the estimator's documented guarantee: same bucket as the order
      // statistic at rank ceil(p*n) (1-based)
      def orderStat(p: Double): Double = vs(math.ceil(p * vs.length).toInt - 1)
      val (p50, p95) = est(g)
      assert(math.abs(p50 - orderStat(0.5)) <= width + 1e-6,
        s"$g p50: $p50 vs order stat ${orderStat(0.5)} (width $width)")
      assert(math.abs(p95 - orderStat(0.95)) <= width + 1e-6,
        s"$g p95: $p95 vs order stat ${orderStat(0.95)} (width $width)")
    }
  }

  test("degenerate (constant) groups return the constant; singletons too") {
    val df = Seq(("a", 7.5), ("a", 7.5), ("a", 7.5), ("b", 42.0))
      .toDF("g", "v")
    val got = Stats.histogramPercentiles(df, "g", "v", Seq(("50", 0.5)))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(got("a") === 7.5)
    assert(got("b") === 42.0)
  }

  test("topFracByClass keeps ~frac per class, threshold-consistent, no per-class sort") {
    // two classes with different scales so per-class thresholds differ
    val rows = (1L to 1000L).map(i => (i, "a", i.toDouble)) ++
      (2001L to 2500L).map(i => (i, "b", (i - 2000).toDouble * 10))
    val df = rows.toDF("id", "cls", "score")
    val kept = graft.ops.Sampling.topFracByClass(df, "cls", "score", frac = 0.1)
      .as[(String, Long, Double)].collect()
    val byCls = kept.groupBy(_._1)
    // kept fraction within one bucket width of the target (1000/256 ≈ 4 rows)
    assert(math.abs(byCls("a").length - 100) <= 8, s"a kept ${byCls("a").length}")
    assert(math.abs(byCls("b").length - 50) <= 8, s"b kept ${byCls("b").length}")
    // threshold-consistency: every kept score beats every dropped score
    // (scores here are unique per class, so the cut is clean)
    val keptIds = kept.map(_._2).toSet
    val dropped = rows.filterNot(r => keptIds.contains(r._1))
    Seq("a", "b").foreach { c =>
      val minKept = byCls(c).map(_._3).min
      val maxDropped = dropped.filter(_._2 == c).map(_._3).max
      assert(minKept > maxDropped, s"$c: kept $minKept <= dropped $maxDropped")
    }
    // frac = 1 keeps everything; layout-invariant
    assert(graft.ops.Sampling.topFracByClass(df, "cls", "score", 1.0).count() === 1500)
    val again = graft.ops.Sampling.topFracByClass(df.repartition(11), "cls", "score", 0.1)
      .as[(String, Long, Double)].collect().map(_._2).toSet
    assert(again === keptIds)
    // scale shape: no window over the DATA — the only windows run on the
    // bounded histogram (<= 256 rows per class)
    val p = graft.ops.Sampling.topFracByClass(df, "cls", "score", 0.1)
      .queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(p.contains("BroadcastHashJoin"), "threshold must broadcast")
  }

  test("approx sketch percentiles land within the estimator's ballpark") {
    val e = Tables.events(spark, sf()).filter(col("value").isNotNull)
    val sk = Stats.approxPercentiles(e, "event_type", "value", Seq(0.5, 0.95))
      .collect().map(r => r.getString(0) -> r.getSeq[Double](1)).toMap
    val est = Stats.histogramPercentiles(e, "event_type", "value",
      Seq(("50", 0.5), ("95", 0.95))).collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    est.foreach { case (g, (p50, p95)) =>
      assert(math.abs(sk(g)(0) - p50) < 5.0, s"$g p50 sketch ${sk(g)(0)} vs $p50")
      assert(math.abs(sk(g)(1) - p95) < 5.0, s"$g p95 sketch ${sk(g)(1)} vs $p95")
    }
  }

  test("chiSquareDrift: identical snapshots score zero in every bin") {
    import spark.implicits._
    val snap = Seq(1.0, 7.5, 42.0, 199.99, -3.0).toDF("v")
    val out = Stats.chiSquareDrift(snap, snap, "v",
      loCents = 0L, widthCents = 500L, buckets = 32).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(r.getAs[Long]("cnt_a") === r.getAs[Long]("cnt_b"))
      assert(r.getAs[Long]("chi2_term_micro") === 0L)
    }
    // clamping: -3.0 and a huge outlier land in the edge bins
    val bins = out.map(_.getAs[Long]("bin"))
    assert(bins.contains(0L))
  }

  test("chiSquareDrift: disjoint snapshots match the hand-computed terms") {
    import spark.implicits._
    // a = 3×1.00 → bin 0; b = 3×10.00 → bin 2 (width 5.00). Per occupied
    // bin D = 3·3 − 0 = 9, term = 10⁶·81/(3·3·3) = 3·10⁶
    val a = Seq(1.0, 1.0, 1.0).toDF("v")
    val b = Seq(10.0, 10.0, 10.0).toDF("v")
    val out = Stats.chiSquareDrift(a, b, "v", 0L, 500L, 32)
      .collect().map(r => r.getAs[Long]("bin") ->
        ((r.getAs[Long]("cnt_a"), r.getAs[Long]("cnt_b"), r.getAs[Long]("chi2_term_micro"))))
      .toMap
    assert(out === Map(0L -> ((3L, 0L, 3000000L)), 2L -> ((0L, 3L, 3000000L))))
  }

  test("streaming drift monitor: drained histogram ≡ batch, score composes") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val vals1 = Seq(1.0, 1.0, 7.5, 42.0)
    val vals2 = Seq(7.5, 199.0, -3.0)
    val in = MemoryStream[Double]
    val q = graft.streaming.DriftStream.binCounts(
        in.toDF().withColumnRenamed("value", "v"), "v", 0L, 500L, 32)
      .writeStream.format("memory").queryName("drifthist")
      .outputMode("complete").start()
    try {
      in.addData(vals1: _*); q.processAllAvailable()
      in.addData(vals2: _*); q.processAllAvailable()
      val streamed = spark.table("drifthist")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val all = (vals1 ++ vals2).toDF("v")
      val batch = all
        .select(least(greatest(expr("(cast(floor(v * 100) as bigint)) div 500"),
          lit(0L)), lit(31L)).as("bin"))
        .groupBy("bin").count()
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(streamed === batch)
      // end-to-end: scoring the drained histogram against a reference via
      // the batch op equals running the batch op on the raw rows
      val ref = Seq(1.0, 1.0, 7.5, 42.0, 199.0).toDF("v")
      val direct = Stats.chiSquareDrift(all, ref, "v", 0L, 500L, 32)
        .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
      // reconstruct the stream side from counts and rerun
      val streamRows = streamed.toSeq.flatMap { case (bin, n) =>
        Seq.fill(n.toInt)(bin * 5.0 + 0.01) } // representative value per bin
      val viaCounts = Stats.chiSquareDrift(streamRows.toDF("v"), ref, "v", 0L, 500L, 32)
        .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
      assert(viaCounts === direct)
    } finally q.stop()
  }

  test("chiSquareDrift: an empty snapshot yields defined zero terms") {
    import spark.implicits._
    val a = Seq(1.0, 10.0).toDF("v")
    val b = a.where(lit(false))
    val out = Stats.chiSquareDrift(a, b, "v", 0L, 500L, 32).collect()
    assert(out.length === 2)
    out.foreach(r => assert(r.getAs[Long]("chi2_term_micro") === 0L))
  }
}
