package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ops.Text.h32

/** DSIR — Data Selection via Importance Resampling (Xie et al. 2023):
  * select raw-corpus documents that look like a small TARGET domain by
  * importance-weighting each document under bag-of-hashed-n-gram unigram
  * models of target vs raw, then Gumbel-top-k resampling proportional to
  * the importance weights. The standard "make 100 TB of web text look like
  * the target distribution" pre-training selection step, complementing the
  * trained-classifier gate ([[Classifier]]) and the temperature/waterfill
  * mix rules ([[Sampling]]).
  *
  * Model: features are word unigrams + bigrams hashed into `buckets`
  * buckets (the paper's hashed n-gram parameterization). Both corpus
  * models are add-α smoothed multinomials over buckets; a document's log
  * importance weight is Σ_b cnt_d(b) · [ln p_target(b) − ln p_raw(b)].
  *
  * Determinism at cluster scale (the same discipline as
  * [[Sampling.temperatureMixture]]): the per-bucket log-ratio is floored
  * to 1e-6 units ONCE (a ≤B-row table), and every per-document weight is
  * then an exact integer dot product — long addition commutes, so the
  * weight is identical under any partitioning / aggregation order, and the
  * DuckDB oracle reproduces it bit-for-bit (the only engine-sensitive op
  * is ln's last ulp, guarded by the micro floor). Feature hashing is the
  * portable md5-based [[Text.h32]], so bucket assignment is also
  * engine-exact.
  *
  * Scale shape (100 TB raw corpus, small target):
  *  - features ride ONE Generate per scan (unigram and bigram arrays are
  *    concatenated before the explode — not a self-union, which would
  *    read the corpus twice);
  *  - the model fit is B-BOUNDED: features aggregate STRAIGHT to
  *    groupBy(bucket) totals (≤B rows, B ~ 10³-10⁴, map-side combined —
  *    no per-document (id, bucket) stage exists anywhere), are
  *    collected, and the λ log-ratio array is computed driver-side
  *    (same JVM ln as the in-plan expression would use) — the
  *    [[Ivf]]-centroid precedent for model-sized driver state. This
  *    keeps the op at the classic two-scan normalizer shape (one stats
  *    pass, one apply pass) instead of the five recomputed aggregation
  *    legs a fully-declarative λ costs (Catalyst does not reuse the
  *    feature subtree across them);
  *  - per-doc weights: the zero-shuffle [[scoredCols]] per-row fold over
  *    the λ literal — ONLY the B-row bucket totals ever shuffle, so the
  *    op's shuffled bytes are independent of corpus size;
  *  - resampling: Gumbel-max selection by a mergeable-histogram
  *    (1−frac) threshold over the perturbed keys (the
  *    [[Sampling.topFracByClass]] rule — frac·N of a corpus is a
  *    corpus-sized k, so an exact top-k would bottleneck one reducer;
  *    the histogram stays mergeable at any N), computed over a
  *    once-materialized ~16 B/doc (id, key) table.
  */
object Dsir {

  /** The uni+bigram feature array of a tokens-array column named `ts` —
    * null iff the text was null; one array op, no self-union.
    */
  private def featArrayOfTs: Column = {
    val bigrams = when(size(col("ts")) >= 2, expr(
        "transform(sequence(0, size(ts) - 2), i -> concat(ts[i], ' ', ts[i + 1]))"))
      .otherwise(expr("cast(array() as array<string>)"))
    concat(col("ts"), bigrams)
  }

  /** Exploded hashed features of one text column: unigrams + space-joined
    * bigrams, each hashed to a bucket in [0, buckets). One row per feature
    * OCCURRENCE (counts matter in the multinomial); one Generate total.
    */
  private def features(df: DataFrame, textCol: String, idCol: String,
      buckets: Int): DataFrame =
    df.select(col(idCol), Text.tokens(col(textCol)).as("ts"))
      .select(col(idCol), explode(featArrayOfTs).as("f"))
      .select(col(idCol), pmod(h32(col("f")), lit(buckets)).as("b"))

  /** Raw-side and target-side bucket totals, collected (≤B rows each).
    * The totals aggregate `features` STRAIGHT to groupBy(b) — only B rows
    * ever shuffle (map-side combined), independent of corpus size; no
    * per-document (id, bucket) stage exists anywhere in the op. One
    * action fetches BOTH tables: the raw and target aggregation legs ride
    * a single union plan, so their stages run in parallel instead of as
    * two serialized driver jobs.
    */
  private def collectedTotals(raw: DataFrame, target: DataFrame,
      textCol: String, idCol: String,
      buckets: Int): (Map[Long, Long], Map[Long, Long]) = {
    def totals(df: DataFrame, side: Int) =
      features(df, textCol, idCol, buckets)
        .groupBy("b").agg(count(lit(1)).as("c"))
        .select(col("b"), col("c"), lit(side).as("side"))
    val both = totals(raw, 0).unionByName(totals(target, 1)).collect()
    (both.filter(_.getInt(2) == 0).map(r => r.getLong(0) -> r.getLong(1)).toMap,
      both.filter(_.getInt(2) == 1).map(r => r.getLong(0) -> r.getLong(1)).toMap)
  }

  /** λ(b) = floor(1e6 · [ln p_target(b) − ln p_raw(b)]) for EVERY bucket
    * in [0, buckets), computed driver-side from the collected totals
    * (exact long sums; the ln/floor double ops are the identical JVM
    * sequence an in-plan Column would run). Smoothing keeps buckets
    * absent from either side finite (add-α over B cells).
    */
  private def lamArray(rawB: Map[Long, Long], tgtB: Map[Long, Long],
      buckets: Int, alpha: Double): Array[Long] = {
    val nr = rawB.valuesIterator.sum
    val nt = tgtB.valuesIterator.sum
    val denom = alpha * buckets
    Array.tabulate(buckets) { b =>
      val cr = rawB.getOrElse(b.toLong, 0L)
      val ct = tgtB.getOrElse(b.toLong, 0L)
      math.floor((math.log((ct + alpha) / (nt + denom)) -
        math.log((cr + alpha) / (nr + denom))) * 1000000.0).toLong
    }
  }

  /** The shared apply pass: (idCol, n_feats, weight_micro) as a pure
    * per-row fold over the B-entry λ literal — zero shuffles, no joins.
    * n_feats = 2·|tokens|−1 (every token is a unigram feature, every
    * adjacent pair a bigram), clamped to 0 for empty/null text, which
    * equals the summed occurrence count the exploded form would produce
    * (pinned by the dsir.serve-equals-batch-weights property).
    */
  private def scoredCols(df: DataFrame, textCol: String, idCol: String,
      lam: Array[Long], buckets: Int): DataFrame = {
    val lamLit = typedLit(lam.toSeq)
    val weight = aggregate(featArrayOfTs, lit(0L), (acc, f) =>
      acc + element_at(lamLit, (pmod(h32(f), lit(buckets)) + lit(1L)).cast("int")))
    df.select(col(idCol), Text.tokens(col(textCol)).as("ts"))
      .select(col(idCol),
        coalesce(size(col("ts")).cast("long") * lit(2L) - lit(1L), lit(0L))
          .as("__nf_raw"),
        coalesce(weight, lit(0L)).as("weight_micro"))
      .select(col(idCol),
        greatest(col("__nf_raw"), lit(0L)).as("n_feats"),
        col("weight_micro"))
  }

  /** Per-document DSIR importance weights against a target corpus:
    * (idCol, n_feats, weight_micro). Documents with no features (empty
    * text) get n_feats = 0, weight_micro = 0. Two B-row stats legs (one
    * union action) fit λ; the apply pass is the zero-shuffle
    * [[scoredCols]] fold — NOTHING in this op shuffles more than B rows.
    */
  def weights(raw: DataFrame, target: DataFrame, textCol: String,
      idCol: String, buckets: Int = 4096, alpha: Double = 0.5): DataFrame = {
    val (rawB, tgtB) = collectedTotals(raw, target, textCol, idCol, buckets)
    scoredCols(raw, textCol, idCol, lamArray(rawB, tgtB, buckets, alpha), buckets)
  }

  /** Gumbel-top-frac importance resampling: keep ~`frac` of the documents
    * that have ≥1 feature, drawn WITHOUT replacement with probability
    * ∝ exp(weight) — the Gumbel-max trick makes that exactly "the largest
    * keys of weight + Gumbel noise". The noise is hash-derived (same
    * portable md5 uniform as [[Sampling.hashSample]]) and floored to micro
    * units, so the draw is reproducible across runs, engines, and cluster
    * layouts. Returns (idCol, key_micro), the kept documents with their
    * perturbed keys.
    *
    * The cut is the [[Stats.histogramPercentiles]] (1−frac) threshold over
    * the key column — the same mergeable-histogram selection rule as
    * [[Sampling.topFracByClass]], approximate within one bucket width of
    * the exact order statistic. NOT a top-k aggregator: frac·N of a corpus
    * is a corpus-sized k, and any exact top-k (bounded-buffer agg or
    * global sort) concentrates O(frac·corpus) work on one reducer — the
    * histogram keeps every stage mergeable at any N. The selection rule
    * IS [[Sampling.topFracByClass]] (one constant class), not a copy of
    * it. The (id, key) table it reads is ~16 bytes/doc and is cached
    * (`persist`, not a checkpoint: evictable blocks RECOMPUTE — an
    * unreleasable localCheckpoint would accumulate non-recomputable
    * storage across calls and fail the job if the LRU ever evicted it)
    * so the cutoff's stats/hist/filter passes share one execution of the
    * feature/λ weight pipeline behind it.
    */
  def resample(raw: DataFrame, target: DataFrame, textCol: String,
      idCol: String, frac: Double, buckets: Int = 4096, alpha: Double = 0.5,
      salt: String = "dsir1", histBuckets: Int = 256): DataFrame = {
    require(frac > 0 && frac <= 1, s"frac must be in (0,1], got $frac")
    val w = weights(raw, target, textCol, idCol, buckets, alpha)
      .filter(col("n_feats") > 0)
    val u = (pmod(h32(concat(col(idCol).cast("string"), lit("_" + salt))),
      lit(1000000)).cast("double") + lit(0.5)) / lit(1000000.0)
    val keyed = w.select(col(idCol),
        (col("weight_micro") +
          floor(-log(-log(u)) * lit(1000000.0))).as("key_micro"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // populate the cache EAGERLY: the cutoff's legs run as concurrent
    // broadcast subqueries, and against a lazy cold cache they race —
    // each leg misses and re-runs the weight pipeline (measured 1.5× at
    // 100×). One count fills the cache once; every leg then reads it.
    keyed.count()
    if (frac == 1.0) return keyed // degenerate cut (w=0 edge) keeps all anyway
    Sampling.topFracByClass(
      keyed.withColumn("__all", lit(0))
        .withColumn("__v", col("key_micro").cast("double")),
      "__all", "__v", frac, histBuckets)
      .select(col(idCol), col("key_micro"))
  }

  /** A fitted, servable DSIR model: the full B-entry λ array (so a doc
    * that hashes into ANY bucket — including one the fitting raw corpus
    * never produced — scores finitely via the smoothing) plus the
    * deterministic keep cutoff in weight space.
    */
  case class DsirModel(buckets: Int, alpha: Double, lam: Array[Long],
      cutMicro: Double)

  /** Fit a servable DSIR gate: λ over every bucket, and the keep cutoff =
    * the [[Stats.histogramPercentiles]] (1−gateFrac) threshold over the
    * RAW corpus's weights (no Gumbel noise — a serving gate is a
    * deterministic quality bar, the noisy draw is [[resample]]'s job).
    * One extra corpus pass over fit's stats pass — fit is the offline
    * step; serving ([[scoreWith]]) is per-row and shuffle-free.
    */
  def fit(raw: DataFrame, target: DataFrame, textCol: String, idCol: String,
      gateFrac: Double = 0.25, buckets: Int = 4096, alpha: Double = 0.5,
      histBuckets: Int = 256): DsirModel = {
    require(gateFrac > 0 && gateFrac <= 1, s"gateFrac must be in (0,1], got $gateFrac")
    val (rawB, tgtB) = collectedTotals(raw, target, textCol, idCol, buckets)
    val lam = lamArray(rawB, tgtB, buckets, alpha)
    // cache the ~8 B/doc weight table eagerly (the resample discipline):
    // the histogram's stats and hist legs would otherwise each re-scan
    // the corpus through the fold. Unlike resample, fit CAN release the
    // cache before returning — the cutoff is collected below and nothing
    // lazy reads the frame afterwards.
    val scored = scoredCols(raw, textCol, idCol, lam, buckets)
      .filter(col("n_feats") > 0)
      .select(col(idCol), col("weight_micro").cast("double").as("__v"))
      .withColumn("__all", lit(0))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    scored.count()
    val cutRows = try Stats.histogramPercentiles(scored, "__all", "__v",
      Seq(("cut", 1.0 - gateFrac)), histBuckets).collect()
    finally scored.unpersist(blocking = false)
    // tokenless fit corpus (fresh ingest, empty slice): a quality bar
    // derived from zero observed weights is undefined, so the model
    // ADMITS NOTHING (cut = +∞) — conservative-by-default rather than a
    // throw (empty slices must not take a 100 TB job down) or a
    // pass-everything gate (silently wrong on later non-empty batches)
    val cut = if (cutRows.isEmpty) Double.PositiveInfinity
      else cutRows.head.getDouble(1)
    DsirModel(buckets, alpha, lam, cut)
  }

  /** Persist a model: `lambda/` (b, lam — all B rows) + `meta/`
    * (buckets, alpha, cut_micro), both parquet so any engine (and the
    * DuckDB oracle) replays scoring from the exact stored values.
    */
  def save(model: DsirModel, spark: SparkSession, path: String): Unit = {
    import spark.implicits._
    model.lam.zipWithIndex.map { case (l, b) => (b.toLong, l) }.toSeq
      .toDF("b", "lam")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/lambda")
    Seq((model.buckets, model.alpha, model.cutMicro))
      .toDF("buckets", "alpha", "cut_micro")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/meta")
  }

  def load(spark: SparkSession, path: String): DsirModel = {
    val m = spark.read.parquet(s"$path/meta").head()
    val buckets = m.getInt(0)
    val lam = new Array[Long](buckets)
    spark.read.parquet(s"$path/lambda").collect()
      .foreach(r => lam(r.getLong(0).toInt) = r.getLong(1))
    DsirModel(buckets, m.getDouble(1), lam, m.getDouble(2))
  }

  /** Serve the gate: per-document (idCol, n_feats, weight_micro, keep)
    * where weight_micro = Σ_features λ(bucket(feature)) — a pure per-row
    * fold over the B-entry λ literal. ZERO shuffles, no joins, no state:
    * the scoring plan is a projection, so it runs at scan speed on a
    * 100 TB corpus and applies unchanged to a streaming Dataset
    * (stateless — the decontamination/quality gate shape for a
    * continuously-arriving corpus). keep = has features AND
    * weight ≥ the fitted cutoff.
    */
  def scoreWith(df: DataFrame, textCol: String, idCol: String,
      model: DsirModel): DataFrame =
    scoredCols(df, textCol, idCol, model.lam, model.buckets)
      .select(col(idCol), col("n_feats"), col("weight_micro"),
        (col("n_feats") > 0 &&
          col("weight_micro").cast("double") >= lit(model.cutMicro)).as("keep"))
}
