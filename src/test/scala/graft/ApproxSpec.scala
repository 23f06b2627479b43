package graft

import org.apache.spark.sql.functions._

/** Approximate aggregates — the sketches a 100 TB engine reaches for when
  * exact answers don't pay their way: HLL++ distinct counts (mergeable,
  * constant memory) and the approx_percentile sketch. Specs pin the error
  * envelope and the partition-invariance (mergeability) that make them
  * safe to use, since no DuckDB oracle can check approximate output.
  */
class ApproxSpec extends SparkSpec {
  import spark.implicits._

  test("approx_count_distinct lands within rsd of truth and merges across partitions") {
    val n = 50000
    val df = spark.range(n).select((col("id") % 9973).as("v")) // 9973 distinct
    val approx = df.select(approx_count_distinct(col("v"), rsd = 0.02))
      .as[Long].head()
    assert(math.abs(approx - 9973).toDouble / 9973 < 0.06,
      s"approx=$approx vs exact=9973")
    // mergeability: the estimate is layout-independent (same sketch merged
    // from 2 or 16 partitions)
    val a2 = df.repartition(2).select(approx_count_distinct(col("v"), rsd = 0.02)).as[Long].head()
    val a16 = df.repartition(16).select(approx_count_distinct(col("v"), rsd = 0.02)).as[Long].head()
    assert(a2 === a16, "HLL merge must be partition-layout independent")
  }

  test("HLL sketches persist, merge incrementally, and estimate within rse") {
    import org.apache.spark.sql.functions._
    // two "days" with overlapping users: 1..3000 and 2001..5000
    val d1 = (1L to 3000L).map(u => ("d1", u)).toDF("day", "user")
    val d2 = (2001L to 5000L).map(u => ("d2", u)).toDF("day", "user")
    val dir = java.nio.file.Files.createTempDirectory("graft_hll").toString
    // build per-day sketches and PERSIST them — the raw data is now gone
    graft.ops.Sketches.distinctSketches(d1.union(d2), Seq("day"), "user")
      .write.mode("overwrite").parquet(dir)
    val stored = spark.read.parquet(dir)
    // per-day estimates
    val perDay = graft.ops.Sketches.rollupEstimate(stored, Seq("day"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(math.abs(perDay("d1") - 3000L) <= 150, s"$perDay")
    assert(math.abs(perDay("d2") - 3000L) <= 150, s"$perDay")
    // cross-day union answers the overlap question WITHOUT the raw data:
    // true distinct = 5000 (not 6000 — 1000 users overlap)
    val global = graft.ops.Sketches.rollupEstimate(stored, Seq.empty)
      .collect().head.getLong(0)
    assert(math.abs(global - 5000L) <= 250, s"global $global")
    // incremental: sketching a NEW day and unioning with stored sketches
    // equals sketching everything from scratch (merge associativity)
    val d3 = (4500L to 6000L).map(u => ("d3", u)).toDF("day", "user")
    val inc = graft.ops.Sketches.rollupEstimate(
      stored.unionByName(
        graft.ops.Sketches.distinctSketches(d3, Seq("day"), "user")), Seq.empty)
      .collect().head.getLong(0)
    val scratch = graft.ops.Sketches.rollupEstimate(
      graft.ops.Sketches.distinctSketches(
        d1.union(d2).union(d3), Seq("day"), "user"), Seq.empty)
      .collect().head.getLong(0)
    assert(inc === scratch, s"incremental $inc vs scratch $scratch")
  }

  test("approx_percentile tracks the exact quantiles within accuracy bounds") {
    val df = spark.range(100000).select(col("id").cast("double").as("v"))
    val Seq(p50, p99) = df
      .select(percentile_approx(col("v"), array(lit(0.5), lit(0.99)), lit(10000)))
      .as[Seq[Double]].head().toSeq
    assert(math.abs(p50 - 50000) < 1000, s"p50=$p50")
    assert(math.abs(p99 - 99000) < 1000, s"p99=$p99")
  }

  // ---- KLL quantile sketches (graft.ops.Sketches.quantileSketches) ----

  /** Exact inclusive-rank quantile: smallest v with count(<=v)/n >= r —
    * the same definition as SQL cume_dist and KLL INCLUSIVE search.
    */
  private def exactQ(values: Seq[Double], r: Double): Double = {
    val sorted = values.sorted
    val n = sorted.size
    sorted(math.max(0, math.ceil(r * n).toInt - 1))
  }

  test("KLL sketches are exact below capacity and partition-layout invariant") {
    // skewed + duplicated values, n=600 per key < k=1024 → exact regime
    val vals = (1 to 600).map(i => ((i * i) % 997).toDouble)
    val df = vals.map(("a", _)).toDF("key", "v")
    def run(d: org.apache.spark.sql.DataFrame) =
      graft.ops.Sketches.rollupQuantiles(
        graft.ops.Sketches.quantileSketches(d, Seq("key"), "v"),
        Seq("key"), Seq(0.5, 0.9, 0.99))
        .collect().head
    val row = run(df)
    assert(row.getDouble(1) === exactQ(vals, 0.5), "p50")
    assert(row.getDouble(2) === exactQ(vals, 0.9), "p90")
    assert(row.getDouble(3) === exactQ(vals, 0.99), "p99")
    assert(row.getLong(4) === 600L)
    // mergeability: partial sketches from any partition layout merge to the
    // same exact answer (all partials below capacity → merge is lossless)
    assert(run(df.repartition(16)) === row, "layout invariance")
  }

  test("KLL sketches persist to parquet and roll up incrementally") {
    val d1 = (1 to 400).map(i => ("d1", i.toDouble))
    val d2 = (1 to 300).map(i => ("d2", (i * 3).toDouble))
    val dir = java.nio.file.Files.createTempDirectory("graft_kll").toString
    graft.ops.Sketches.quantileSketches(
      (d1 ++ d2).toDF("day", "v"), Seq("day"), "v")
      .write.mode("overwrite").parquet(dir)
    val stored = spark.read.parquet(dir)
    // global quantiles from merged per-day sketches, raw data gone; total
    // 700 < k → the merge is lossless and the answer exact
    val g = graft.ops.Sketches.rollupQuantiles(stored, Seq.empty, Seq(0.5, 0.9))
      .collect().head
    val all = (d1 ++ d2).map(_._2)
    assert(g.getDouble(0) === exactQ(all, 0.5), s"global p50 ${g.getDouble(0)}")
    assert(g.getDouble(1) === exactQ(all, 0.9), s"global p90 ${g.getDouble(1)}")
    assert(g.getLong(2) === 700L)
    // incremental: union stored sketches with a NEW day's sketch ==
    // sketching everything from scratch (merge associativity, exact regime)
    val d3 = (1 to 200).map(i => ("d3", (i * 7).toDouble))
    val inc = graft.ops.Sketches.rollupQuantiles(
      stored.unionByName(graft.ops.Sketches.quantileSketches(
        d3.toDF("day", "v"), Seq("day"), "v")), Seq.empty, Seq(0.5, 0.9))
      .collect().head
    val scratch = graft.ops.Sketches.rollupQuantiles(
      graft.ops.Sketches.quantileSketches(
        (d1 ++ d2 ++ d3).toDF("day", "v"), Seq("day"), "v"),
      Seq.empty, Seq(0.5, 0.9)).collect().head
    assert(inc === scratch, s"incremental $inc vs scratch $scratch")
  }

  test("KLL compacting regime stays within the k-determined rank error") {
    // n=100k >> k=200 → heavy compaction; KLL guarantees the TRUE rank of
    // the returned quantile is within eps(k=200) ~ 1.65% of the requested
    // rank with high probability (use 3% for test stability)
    val n = 100000
    val df = spark.range(n).select(col("id").cast("double").as("v"))
      .withColumn("key", lit("x"))
    val row = graft.ops.Sketches.rollupQuantiles(
      graft.ops.Sketches.quantileSketches(df, Seq("key"), "v", k = 200),
      Seq("key"), Seq(0.25, 0.5, 0.9), k = 200).collect().head
    for ((r, i) <- Seq(0.25, 0.5, 0.9).zipWithIndex) {
      val est = row.getDouble(i + 1)
      val trueRank = (est + 1) / n // values are 0..n-1: rank(v) = (v+1)/n
      assert(math.abs(trueRank - r) < 0.03, s"rank($est)=$trueRank vs $r")
    }
    assert(row.getLong(4) === n.toLong)
  }

  test("KLL nulls and NaN are excluded; empty sketch probes to null") {
    val df = Seq[(String, java.lang.Double)](
      ("a", 1.0), ("a", null), ("a", Double.NaN), ("a", 3.0))
      .toDF("key", "v")
    val row = graft.ops.Sketches.rollupQuantiles(
      graft.ops.Sketches.quantileSketches(df, Seq("key"), "v"),
      Seq("key"), Seq(1.0)).collect().head
    assert(row.getDouble(1) === 3.0, "max over {1,3} — null skipped")
    // n_rows counts non-null rows; NaN is sketch-skipped but row-counted
    assert(row.getLong(2) === 3L)
    // an all-null group has no rankable values: quantileSketches excludes
    // it entirely (no group, rather than a null-quantile row)
    val empty = Seq[(String, java.lang.Double)](("a", null)).toDF("key", "v")
    assert(graft.ops.Sketches.rollupQuantiles(
      graft.ops.Sketches.quantileSketches(empty, Seq("key"), "v"),
      Seq("key"), Seq(0.5)).count() === 0L)
    // a GLOBAL aggregate over zero rows still emits one row: the empty
    // sketch probes to null, not an exception
    graft.functions.Native.register(spark)
    empty.filter(col("v").isNotNull).createOrReplaceTempView("kll_empty")
    val er = spark.sql(
      """SELECT graft_kll_quantiles(graft_kll_agg(v), array(0.5D)) AS q
        |FROM kll_empty""".stripMargin).collect().head
    assert(er.isNullAt(0), "empty sketch → null quantile")
  }

  test("KLL SQL surface: graft_kll_agg / graft_kll_merge / graft_kll_quantiles") {
    graft.functions.Native.register(spark)
    (1 to 100).map(i => ("s" + (i % 2), i.toDouble)).toDF("src", "v")
      .createOrReplaceTempView("kll_in")
    val out = spark.sql(
      """SELECT element_at(graft_kll_quantiles(
        |         graft_kll_merge(sk), array(0.5D)), 1) AS p50
        |FROM (SELECT src, graft_kll_agg(v) AS sk FROM kll_in GROUP BY src)
        |""".stripMargin).collect().head.getDouble(0)
    assert(out === 50.0, s"sql p50 $out")
  }

  // ---- theta sketches (graft.ops.Sketches.overlapSketches/corpusOverlap) ----

  test("theta overlap report is exact below capacity and layout invariant") {
    // A = 1..3000, B = 2001..5000 → |A∩B|=1000, |A∪B|=5000, A\B=2000
    val a = (1L to 3000L).toDF("v")
    val b = (2001L to 5000L).toDF("v")
    def run(x: org.apache.spark.sql.DataFrame, y: org.apache.spark.sql.DataFrame) =
      graft.ops.Sketches.corpusOverlap(x, y, "v").collect().head
    val r = run(a, b)
    assert(r.getDouble(0) === 3000.0, "n_a")
    assert(r.getDouble(1) === 3000.0, "n_b")
    assert(r.getDouble(2) === 1000.0, "n_common")
    assert(r.getDouble(3) === 5000.0, "n_union")
    assert(r.getDouble(4) === 2000.0, "n_only_a")
    assert(r.getDouble(5) === 2000.0, "n_only_b")
    // mergeability: partial sketches from any partition layout union to
    // the same exact sketch below capacity
    assert(run(a.repartition(16), b.repartition(7)) === r, "layout invariance")
  }

  test("theta sketches persist to parquet and answer set algebra later") {
    val shards = (1L to 4000L).map(v => ("s" + (v % 4), v)).toDF("shard", "v")
    val dir = java.nio.file.Files.createTempDirectory("graft_theta").toString
    graft.ops.Sketches.overlapSketches(shards, Seq("shard"), "v")
      .write.mode("overwrite").parquet(dir)
    val stored = spark.read.parquet(dir)
    graft.functions.Native.register(spark)
    // the 4 residue-class shards are disjoint: union = 4000, intersection = 0
    val row = stored.agg(
      graft.functions.Native.thetaEstimate(
        graft.functions.Native.thetaMerge(col("tsketch"))).as("u"),
      graft.functions.Native.thetaEstimate(
        graft.functions.Native.thetaIntersectAgg(col("tsketch"))).as("i"))
      .collect().head
    assert(row.getDouble(0) === 4000.0, "union of stored shards")
    assert(row.getDouble(1) === 0.0, "intersection of disjoint shards")
    // incremental: a NEW shard 3901..4100 — half overlaps the stored
    // corpus (3901..4000), half is genuinely new (4001..4100)
    val s4 = (3901L to 4100L)
    val inc = stored.unionByName(
      graft.ops.Sketches.overlapSketches(
        s4.toDF("v").withColumn("shard", lit("s4")), Seq("shard"), "v"))
    val u2 = inc.agg(graft.functions.Native.thetaEstimate(
      graft.functions.Native.thetaMerge(col("tsketch")))).collect().head.getDouble(0)
    assert(u2 === 4100.0, s"union with overlapping new shard $u2")
  }

  test("theta sampling regime stays within the k-determined rse") {
    // 200k distincts >> 2^lgK=512 retained → deep sampling; rse ~ 1/sqrt(512)
    // ≈ 4.4%, test at 4 sigma for stability
    val n = 200000
    val df = spark.range(n).select(col("id").as("v"))
    val est = df.agg(graft.functions.Native.thetaEstimate(
      graft.functions.Native.thetaAgg(col("v"), lgK = 9))).collect().head.getDouble(0)
    assert(math.abs(est - n) / n < 0.18, s"est=$est vs n=$n")
    // a-not-b of half the range in the sampling regime: relative error on
    // the difference stays bounded too
    val half = spark.range(n / 2).select(col("id").as("v"))
    val skAll = df.agg(graft.functions.Native.thetaAgg(col("v"), lgK = 9).as("s"))
    val skHalf = half.agg(graft.functions.Native.thetaAgg(col("v"), lgK = 9).as("s"))
    val diff = skAll.crossJoin(skHalf.withColumnRenamed("s", "t"))
      .select(graft.functions.Native.thetaEstimate(
        graft.functions.Native.thetaANotB(col("s"), col("t"))))
      .collect().head.getDouble(0)
    assert(math.abs(diff - n / 2.0) / (n / 2.0) < 0.25, s"diff=$diff vs ${n / 2}")
  }

  test("theta nulls are excluded; intersect-agg over zero rows is null") {
    val df = Seq[(String, java.lang.Long)](("a", 1L), ("a", null), ("a", 2L))
      .toDF("k", "v")
    val est = df.groupBy("k").agg(graft.functions.Native.thetaEstimate(
      graft.functions.Native.thetaAgg(col("v"))).as("n")).collect().head
    assert(est.getDouble(1) === 2.0, "nulls skipped")
    // intersect-agg with no input rows: identity is the universal set,
    // which has no sketch — the answer is null, not an empty sketch
    graft.functions.Native.register(spark)
    val r = spark.sql(
      """SELECT graft_theta_intersect_agg(s) AS i FROM (
        |  SELECT graft_theta_agg(v) AS s FROM VALUES (1L) AS t(v) WHERE v > 100
        |  GROUP BY v)""".stripMargin).collect().head
    assert(r.isNullAt(0), "empty intersect-agg → null")
  }

  test("theta SQL surface: agg / merge / set_op / estimate round-trip") {
    graft.functions.Native.register(spark)
    (1 to 300).map(i => ("s" + (i % 3), i.toLong)).toDF("src", "v")
      .createOrReplaceTempView("theta_in")
    // per-src sketches hold disjoint residue classes; pairwise intersect of
    // s0 with itself = 100, with s1 = 0
    val out = spark.sql(
      """WITH sk AS (SELECT src, graft_theta_agg(v) AS s FROM theta_in GROUP BY src)
        |SELECT
        |  graft_theta_estimate(graft_theta_merge(s)) AS total,
        |  graft_theta_estimate(graft_theta_set_op(min(s), max(s), 'intersect')) AS disj,
        |  graft_theta_estimate(graft_theta_set_op(min(s), max(s), 'union')) AS pair_union
        |FROM sk""".stripMargin).collect().head
    assert(out.getDouble(0) === 300.0, s"total ${out.getDouble(0)}")
    assert(out.getDouble(1) === 0.0, s"disjoint ${out.getDouble(1)}")
    assert(out.getDouble(2) === 200.0, s"pair union ${out.getDouble(2)}")
  }
}
