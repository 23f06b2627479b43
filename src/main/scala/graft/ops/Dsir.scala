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
  * to 1e-6 units ONCE (a B-row table), and every per-document weight is
  * then an exact integer dot product — long addition commutes, so the
  * weight is identical under any partitioning / aggregation order, and the
  * DuckDB oracle reproduces it bit-for-bit (the only engine-sensitive op
  * is ln's last ulp, guarded by the micro floor). Feature hashing is the
  * portable md5-based [[Text.h32]], so bucket assignment is also
  * engine-exact.
  *
  * Scale shape (100 TB raw corpus, small target):
  *  - feature explode is narrow, O(tokens);
  *  - per-doc bucket counts: one shuffle keyed (id, bucket), map-side
  *    partially aggregated;
  *  - bucket totals: B-row aggregates (B ~ 10⁴), map-side combined;
  *  - the λ log-ratio table is ≤ B rows → broadcast joined back;
  *  - per-doc weights: one groupBy(id) long sum;
  *  - resampling: Gumbel-max top-k through the bounded
  *    [[graft.functions.TopK]] aggregator — each partition ships ≤ k
  *    candidates, never the corpus (no global sort). Selecting k itself
  *    costs one count action (two passes total; documented trade, the
  *    count is a metadata-cheap scan of the weights it must read anyway).
  */
object Dsir {

  /** Exploded hashed features of one text column: unigrams + space-joined
    * bigrams, each hashed to a bucket in [0, buckets). One row per feature
    * OCCURRENCE (counts matter in the multinomial).
    */
  private def features(df: DataFrame, textCol: String, idCol: String,
      buckets: Int): DataFrame = {
    val ts = Text.tokens(col(textCol))
    val unis = df.select(col(idCol), explode(ts).as("f"))
    val bis = df.select(col(idCol), ts.as("ts"))
      .filter(size(col("ts")) >= 2)
      .select(col(idCol), explode(expr(
        "transform(sequence(0, size(ts) - 2), i -> concat(ts[i], ' ', ts[i + 1]))"))
        .as("f"))
    unis.unionByName(bis)
      .select(col(idCol), pmod(h32(col("f")), lit(buckets)).as("b"))
  }

  /** Per-document hashed-feature bucket counts: (idCol, b, cnt). */
  private def docBucketCounts(df: DataFrame, textCol: String, idCol: String,
      buckets: Int): DataFrame =
    features(df, textCol, idCol, buckets)
      .groupBy(col(idCol), col("b")).agg(count(lit(1)).as("cnt"))

  /** The per-bucket floored log importance ratio λ(b) =
    * floor(1e6 · [ln p_target(b) − ln p_raw(b)]) as a ≤B-row table
    * (b, lam). Only buckets PRESENT in raw are emitted — documents being
    * scored are raw documents, so absent buckets can't contribute.
    * Smoothing keeps target-absent buckets finite (add-α over B cells).
    */
  private def lambdaTable(rawCounts: DataFrame, target: DataFrame,
      textCol: String, idCol: String, buckets: Int, alpha: Double): DataFrame = {
    val rawB = rawCounts.groupBy("b").agg(sum("cnt").as("cr"))
    val tgtB = docBucketCounts(target, textCol, idCol, buckets)
      .groupBy("b").agg(sum("cnt").as("ct"))
    val nr = rawB.agg(coalesce(sum("cr"), lit(0L)).as("nr"))
    val nt = tgtB.agg(coalesce(sum("ct"), lit(0L)).as("nt"))
    val denom = lit(alpha) * lit(buckets)
    rawB.join(tgtB, Seq("b"), "left")
      .crossJoin(broadcast(nr)).crossJoin(broadcast(nt))
      .select(col("b"),
        floor((log((coalesce(col("ct"), lit(0L)) + lit(alpha)) /
                   (col("nt") + denom)) -
               log((col("cr") + lit(alpha)) /
                   (col("nr") + denom))) * lit(1000000.0)).as("lam"))
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

  /** Gumbel-top-k importance resampling: keep ceil(frac · N) of the N
    * documents that have ≥1 feature, drawn WITHOUT replacement with
    * probability ∝ exp(weight) — the Gumbel-max trick makes that exactly
    * "top-k of weight + Gumbel noise". The noise is hash-derived (same
    * portable md5 uniform as [[Sampling.hashSample]]) and floored to micro
    * units, so the draw is reproducible across runs, engines, and cluster
    * layouts. Returns (idCol, key_micro), the kept documents with their
    * perturbed keys.
    */
  def resample(raw: DataFrame, target: DataFrame, textCol: String,
      idCol: String, frac: Double, buckets: Int = 4096, alpha: Double = 0.5,
      salt: String = "dsir1"): DataFrame = {
    require(frac > 0 && frac <= 1, s"frac must be in (0,1], got $frac")
    graft.functions.TopK.requireIntegralId(raw.schema, idCol, "Dsir.resample")
    val w = weights(raw, target, textCol, idCol, buckets, alpha)
      .filter(col("n_feats") > 0)
    val u = (pmod(h32(concat(col(idCol).cast("string"), lit("_" + salt))),
      lit(1000000)).cast("double") + lit(0.5)) / lit(1000000.0)
    val keyed = w.select(col(idCol).cast("long").as("__id"),
      (col("weight_micro") +
        floor(-log(-log(u)) * lit(1000000.0))).cast("double").as("__key"))
    // k from one count action: bounded-TopK needs a concrete k at plan
    // time. "Has ≥1 feature" ≡ "has ≥1 token" (every token is a unigram
    // feature), so the count is ONE cheap corpus scan — it never runs the
    // hash/λ-join weight pipeline, which therefore executes exactly once.
    val n = raw.filter(size(Text.tokens(col(textCol))) > 0).count()
    val k = math.ceil(frac * n).toLong.max(1L).toInt
    keyed.groupBy()
      .agg(graft.functions.TopK.topK(k)(col("__key"), col("__id")).as("topk"))
      .select(explode(col("topk")).as("item"))
      .select(col("item._2").as(idCol), col("item._1").cast("long").as("key_micro"))
  }
}
