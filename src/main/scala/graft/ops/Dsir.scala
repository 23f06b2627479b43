package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
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
  *  - per-doc bucket counts: one shuffle keyed (id, bucket), map-side
  *    partially aggregated;
  *  - the model fit is B-BOUNDED: bucket totals aggregate to ≤B rows
  *    (B ~ 10³-10⁴), are collected, and the λ log-ratio table is computed
  *    driver-side (same JVM ln as the in-plan expression would use) and
  *    broadcast back — the [[Ivf]]-centroid precedent for model-sized
  *    driver state. This keeps the whole op at the classic two-scan
  *    normalizer shape (one stats pass, one apply pass) instead of the
  *    five recomputed aggregation legs a fully-declarative λ costs
  *    (Catalyst does not reuse the feature subtree across them);
  *  - per-doc weights: one groupBy(id) long sum;
  *  - resampling: Gumbel-max selection by a mergeable-histogram
  *    (1−frac) threshold over the perturbed keys (the
  *    [[Sampling.topFracByClass]] rule — frac·N of a corpus is a
  *    corpus-sized k, so an exact top-k would bottleneck one reducer;
  *    the histogram stays mergeable at any N), computed over a
  *    once-materialized ~16 B/doc (id, key) table.
  */
object Dsir {

  /** Exploded hashed features of one text column: unigrams + space-joined
    * bigrams, each hashed to a bucket in [0, buckets). One row per feature
    * OCCURRENCE (counts matter in the multinomial); one Generate total.
    */
  private def features(df: DataFrame, textCol: String, idCol: String,
      buckets: Int): DataFrame = {
    val withToks = df.select(col(idCol), Text.tokens(col(textCol)).as("ts"))
    val bigrams = when(size(col("ts")) >= 2, expr(
        "transform(sequence(0, size(ts) - 2), i -> concat(ts[i], ' ', ts[i + 1]))"))
      .otherwise(expr("cast(array() as array<string>)"))
    withToks
      .select(col(idCol), explode(concat(col("ts"), bigrams)).as("f"))
      .select(col(idCol), pmod(h32(col("f")), lit(buckets)).as("b"))
  }

  /** Per-document hashed-feature bucket counts: (idCol, b, cnt). */
  private def docBucketCounts(df: DataFrame, textCol: String, idCol: String,
      buckets: Int): DataFrame =
    features(df, textCol, idCol, buckets)
      .groupBy(col(idCol), col("b")).agg(count(lit(1)).as("cnt"))

  /** The per-bucket floored log importance ratio λ(b) =
    * floor(1e6 · [ln p_target(b) − ln p_raw(b)]) as a ≤B-row broadcast
    * table (b, lam), computed driver-side from the two collected B-row
    * bucket-total tables (exact long totals; the ln/floor double ops are
    * the identical JVM sequence an in-plan Column would run). Only buckets
    * PRESENT in raw are emitted — documents being scored are raw
    * documents, so absent buckets can't contribute. Smoothing keeps
    * target-absent buckets finite (add-α over B cells).
    */
  private def lambdaTable(rawCounts: DataFrame, target: DataFrame,
      textCol: String, idCol: String, buckets: Int, alpha: Double): DataFrame = {
    val spark = rawCounts.sparkSession
    // one action fetches BOTH stats tables (≤2B rows): the raw and target
    // aggregation legs ride a single union plan, so their stages run in
    // parallel instead of as two serialized driver jobs
    val both = rawCounts.groupBy("b").agg(sum("cnt").as("c"))
      .select(col("b"), col("c"), lit(0).as("side"))
      .unionByName(docBucketCounts(target, textCol, idCol, buckets)
        .groupBy("b").agg(sum("cnt").as("c"))
        .select(col("b"), col("c"), lit(1).as("side")))
      .collect()
    val rawB: Map[Long, Long] =
      both.filter(_.getInt(2) == 0).map(r => r.getLong(0) -> r.getLong(1)).toMap
    val tgtB: Map[Long, Long] =
      both.filter(_.getInt(2) == 1).map(r => r.getLong(0) -> r.getLong(1)).toMap
    val nr = rawB.valuesIterator.sum
    val nt = tgtB.valuesIterator.sum
    val denom = alpha * buckets
    val rows = rawB.toSeq.sortBy(_._1).map { case (b, cr) =>
      val ct = tgtB.getOrElse(b, 0L)
      val lam = math.floor((math.log((ct + alpha) / (nt + denom)) -
        math.log((cr + alpha) / (nr + denom))) * 1000000.0).toLong
      (b, lam)
    }
    import spark.implicits._
    rows.toDF("b", "lam")
  }

  /** Per-document DSIR importance weights against a target corpus:
    * (idCol, n_feats, weight_micro). Documents with no features (empty
    * text) get n_feats = 0, weight_micro = 0.
    */
  def weights(raw: DataFrame, target: DataFrame, textCol: String,
      idCol: String, buckets: Int = 4096, alpha: Double = 0.5): DataFrame = {
    val dc = docBucketCounts(raw, textCol, idCol, buckets)
    val lam = lambdaTable(dc, target, textCol, idCol, buckets, alpha)
    val w = dc.join(broadcast(lam), Seq("b"))
      .groupBy(idCol)
      .agg(sum("cnt").as("n_feats"),
        sum(col("cnt") * col("lam")).as("weight_micro"))
    raw.select(col(idCol))
      .join(w, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_feats"), lit(0L)).as("n_feats"),
        coalesce(col("weight_micro"), lit(0L)).as("weight_micro"))
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
    * histogram keeps every stage mergeable at any N. The (id, key) table
    * the histogram reads is ~16 bytes/doc and is materialized ONCE
    * (localCheckpoint) so the cutoff's stats/hist/filter passes never
    * re-run the feature/λ weight pipeline behind it.
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
      .localCheckpoint()
    if (frac == 1.0) return keyed // degenerate cut (w=0 edge) keeps all anyway
    val thr = Stats.histogramPercentiles(
      keyed.select(col(idCol), col("key_micro").cast("double").as("__v"))
        .withColumn("__all", lit(0)),
      "__all", "__v", Seq(("cut", 1.0 - frac)), histBuckets)
    keyed.withColumn("__all", lit(0))
      .join(broadcast(thr), "__all")
      .filter(col("key_micro").cast("double") >= col("p_cut"))
      .select(col(idCol), col("key_micro"))
  }
}
