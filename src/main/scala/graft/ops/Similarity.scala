package graft.ops

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.ops.Text.floor6

/** Similarity search over an embedding column (`Array[Float]`).
  *
  * Two paths:
  *  - [[cosineTopK]]: brute-force cosine top-k — broadcast the (small) query
  *    set, one narrow scan over the corpus, per-query top-k. The correctness
  *    baseline.
  *  - [[lshBuckets]] + [[bucketedTopK]]: sign-random-projection LSH — the
  *    100 TB path. Bucketing is a pure per-row projection; the candidate
  *    join is an equi-join on the bucket id, never a cross join.
  *
  * Hyperplanes are derived deterministically from md5 (same construction as
  * [[Text.h32]]) so the DuckDB oracle can embed the identical literals and
  * reproduce every bucket bit.
  */
object Similarity {

  /** Deterministic pseudo-random double in [-1, 1): first 8 md5 hex digits
    * of "hp_<plane>_<i>" scaled by 2^31. Engine-portable by construction.
    */
  def hyperplane(plane: Int, dim: Int): Seq[Double] = {
    val md = MessageDigest.getInstance("MD5")
    (0 until dim).map { i =>
      val hex = md.digest(s"hp_${plane}_$i".getBytes(StandardCharsets.UTF_8))
        .take(4).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex, 16).toDouble / 2147483648.0 - 1.0
    }
  }

  /** Sequential-fold dot product — native codegen'd Catalyst expression
    * ([[graft.functions.DotProduct]]); identical left-to-right IEEE order
    * to the DuckDB oracle's list_dot_product.
    */
  def dot(a: Column, b: Column): Column = graft.functions.Native.dot(a, b)

  private def asDouble(c: Column): Column = c.cast("array<double>")

  /** Explode a top-k array-of-(score,id) struct column back to ranked rows:
    * (group columns..., neighbor_id, rnk, sim).
    */
  private[ops] def explodeTopK(grouped: DataFrame, groupCols: Seq[String]): DataFrame =
    grouped
      .select(groupCols.map(col) :+ posexplode(col("topk")).as(Seq("pos", "item")): _*)
      .select(groupCols.map(col) ++ Seq(
        col("item._2").as("neighbor_id"),
        (col("pos") + 1).cast("int").as("rnk"),
        floor6(col("item._1")).as("sim")): _*)

  /** Brute-force cosine top-k: for each query vector, the k nearest corpus
    * vectors by cosine (ties broken by id). Queries are broadcast; corpus is
    * scanned once. Ranking is a bounded [[graft.functions.TopK]] aggregation
    * — partial top-k per partition, merged on the reducer — so the shuffle
    * carries ≤ k pairs per query per partition instead of the full
    * per-query candidate list (no one-reducer-per-query ceiling).
    */
  def cosineTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, k: Int = 5): DataFrame = {
    graft.functions.TopK.requireIntegralId(corpus.schema, idCol, "cosineTopK")
    def norm(v: Column): Column = sqrt(dot(v, v))
    val c = corpus.select(col(idCol).as("neighbor_id"), asDouble(col(vecCol)).as("cv"))
      .withColumn("cn", norm(col("cv")))
    val q = queries.select(col(idCol).as("query_id"), asDouble(col(vecCol)).as("qv"))
      .withColumn("qn", norm(col("qv")))
    val cos = when(col("qn") * col("cn") > 0,
      dot(col("qv"), col("cv")) / (col("qn") * col("cn"))).otherwise(lit(0.0))
    val scored = c.join(broadcast(q), col("neighbor_id") =!= col("query_id"))
      .select(col("query_id"), col("neighbor_id"), cos.as("cos"))
    val grouped = scored.groupBy("query_id")
      .agg(graft.functions.TopK.topK(k)(col("cos"), col("neighbor_id")).as("topk"))
    explodeTopK(grouped, Seq("query_id"))
      .select("query_id", "neighbor_id", "rnk", "sim")
  }

  /** Recall@k audit: per query, the fraction of the EXACT top-k that an
    * approximate searcher returned — the operational gate that keeps an
    * ANN index honest in production (rebuild/re-tune when recall drifts
    * below target). Generic over any two (query_id, neighbor_id) result
    * sets; run it on a HASH-SAMPLED probe set (the exact side is a brute
    * scan per probe — the audit's cost knob is the sample rate, never the
    * corpus). One key shuffle: hit-marking is an equi-join on
    * (query_id, neighbor_id), the reduce is per-query.
    */
  def recallAtK(exact: DataFrame, approx: DataFrame): DataFrame =
    exact.select(col("query_id"), col("neighbor_id"))
      .join(approx.select(col("query_id"), col("neighbor_id"))
        .withColumn("__hit", lit(1L)),
        Seq("query_id", "neighbor_id"), "left")
      .groupBy("query_id")
      .agg(count(lit(1)).as("n_exact"),
        sum(coalesce(col("__hit"), lit(0L))).as("n_hit"))
      .select(col("query_id"), col("n_exact"), col("n_hit"),
        graft.ops.Text.floor6(col("n_hit").cast("double") / col("n_exact").cast("double"))
          .as("recall"))

  /** Symmetric per-vector int8 quantization — the storage/shuffle lever
    * for 100 TB ANN (4× smaller than float32 on disk and on the candidate
    * shuffle). `scale = maxabs/127`; codes = round-half-up(v·127/maxabs),
    * clamped to ±127. Round-half-up is spelled floor(x+0.5): engines
    * disagree on round()'s tie handling, never on floor. The scale is
    * 6dp-floored so downstream consumers and the oracle share one value.
    */
  def quantizeInt8(df: DataFrame, idCol: String, vecCol: String): DataFrame = {
    // r21: one native pass per row ([[org.apache.spark.sql.graft
    // .QuantizeInt8]]) — the column form paid three interpreted
    // `transform` lambdas (abs for the max, the code map, the zero
    // fallback); codes and scale are bit-identical
    // ([[quantizeInt8Ref]], SimilaritySpec pin). __m staged in its own
    // projection: referenced twice by the scale expression, and
    // CollapseProject keeps a non-cheap multi-referenced alias
    // materialized once per row (the old __maxabs discipline).
    val m = col("__m")
    df.select(col(idCol), asDouble(col(vecCol)).as("__v"))
      .select(col(idCol), col("__v"),
        org.apache.spark.sql.graft.VecFns.maxAbs(col("__v")).as("__m"))
      .select(col(idCol),
        org.apache.spark.sql.graft.VecFns.quantizeInt8(col("__v")).as("qvec"),
        floor6(when(m > 0, m / lit(127.0)).otherwise(lit(0.0))).as("scale"))
  }

  /** REFERENCE FORM of [[quantizeInt8]]'s kernel (spec-pinned on the
    * corpus and non-null edges). Deliberate divergence on null vector
    * ELEMENTS only — no engine table has one: this form's
    * least/greatest-skip-nulls chain mapped a null element to code 127
    * (m > 0) or 0 (all-null vector); the kernel keeps null elements
    * null, the saner contract.
    */
  private[graft] def quantizeInt8Ref(df: DataFrame, idCol: String, vecCol: String): DataFrame = {
    // __maxabs in its own projection: referenced 4× downstream (incl.
    // inside the transform lambda), so a single-select form would inline
    // the array_max into the per-element body — O(d²)/row. As a separate
    // non-cheap multi-referenced alias, CollapseProject keeps it
    // materialized once per row (SimilaritySpec pins this).
    val base = df.select(col(idCol), asDouble(col(vecCol)).as("__v"))
      .select(col(idCol), col("__v"),
        array_max(transform(col("__v"), x => abs(x))).as("__maxabs"))
    val m = col("__maxabs")
    base.select(col(idCol),
      when(m > 0, transform(col("__v"), x => greatest(lit(-127L), least(lit(127L),
        floor(x * lit(127.0) / m + lit(0.5)).cast("long")))))
        .otherwise(transform(col("__v"), _ => lit(0L))).as("qvec"),
      floor6(when(m > 0, m / lit(127.0)).otherwise(lit(0.0))).as("scale"))
  }

  /** Brute-force cosine top-k over int8-quantized vectors. Per-vector
    * scales cancel in the cosine (cos(s_a·qa, s_b·qb) = cos(qa, qb)), so
    * the score is integer dot products only — exact in both engines at any
    * summation order (values < 2^53), hence oracle-stable by construction.
    * Recall loss vs [[cosineTopK]] is the quantization error; the
    * SimilaritySpec pins it on the synthetic corpus.
    */
  def quantizedCosineTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, k: Int = 5): DataFrame = {
    def q(df: DataFrame) = quantizeInt8(df, idCol, vecCol)
      .select(col(idCol), col("qvec").cast("array<double>").as(vecCol))
    cosineTopK(q(corpus), q(queries), idCol, vecCol, k)
  }

  /** Sign-random-projection LSH bucket id: bit p = (v · hyperplane_p >= 0).
    * 2^planes buckets; a pure per-row projection (no shuffle).
    */
  def lshBucket(vecCol: Column, dim: Int, planes: Int): Column =
    (0 until planes).map { p =>
      val hp = array(hyperplane(p, dim).map(lit): _*)
      when(dot(asDouble(vecCol), hp) >= 0, lit(1L << p)).otherwise(lit(0L))
    }.reduce(_ + _).cast("long")

  def lshBuckets(df: DataFrame, idCol: String, vecCol: String, dim: Int,
      planes: Int = 8): DataFrame =
    df.select(col(idCol), lshBucket(col(vecCol), dim, planes).as("bucket"))

  /** Scale path: top-k within the LSH bucket only — candidate generation is
    * an equi-join on bucket id. Recall < 1 by design; raise `planes` tables
    * or probe neighboring buckets for higher recall.
    */
  /** (id, v, n, bucket) projection shared by the bucketed searches. */
  private[graft] def bucketedBase(df: DataFrame, idCol: String, vecCol: String,
      dim: Int, planes: Int): DataFrame =
    df.select(col(idCol), asDouble(col(vecCol)).as("v"),
      lshBucket(col(vecCol), dim, planes).as("bucket"))
      .withColumn("n", sqrt(dot(col("v"), col("v"))))

  /** Cosine over the (qv, qn)/(cv, cn) candidate-pair columns. */
  private[graft] val candCos: Column = when(col("qn") * col("cn") > 0,
    dot(col("qv"), col("cv")) / (col("qn") * col("cn"))).otherwise(lit(0.0))

  private def neighborSide(base: DataFrame, idCol: String): DataFrame =
    base.select(col(idCol).as("neighbor_id"), col("v").as("cv"), col("n").as("cn"),
      col("bucket").as("bucket2"))

  private def rankTopK(cands: DataFrame, groupCols: Seq[String], k: Int): DataFrame =
    explodeTopK(
      cands.groupBy(groupCols.map(col): _*)
        .agg(graft.functions.TopK.topK(k)(col("cos"), col("neighbor_id")).as("topk")),
      groupCols)

  /** Hot-bucket guard for the bucketed searches: the candidate join's
    * fan-out is Σ|bucket|², and real (clustered) embeddings pile into few
    * buckets — one degenerate bucket pins a reducer at corpus scale (the
    * same failure mode [[Dedup.minhashCandidatePairs]] caps). Rows of the
    * NEIGHBOR side whose bucket exceeds `maxBucket` are thinned
    * deterministically by id hash (keep iff h32(id·salt) lands on the
    * ceil(size/maxBucket) stride), bounding expected fan-out to
    * ≤ |corpus| × maxBucket while every query still gets answered from
    * ~maxBucket sampled bucket-mates.
    *
    * Why thin instead of splitting hot buckets with extra hyperplanes: a
    * hot bucket usually IS a tight cluster, and a tight cluster projects
    * the same sign on the extra planes too — splitting fails exactly when
    * it's needed. Hash thinning bounds cost unconditionally; recall within
    * a hot bucket degrades gracefully (uniform candidate sample). Audit
    * what was thinned with [[bucketOccupancyStats]].
    *
    * The bucket-size table has ≤ 2^planes rows, so the size lookup is a
    * broadcast join, never a shuffle.
    */
  private[graft] def thinHotBuckets(base: DataFrame, idCol: String,
      maxBucket: Int): DataFrame =
    if (maxBucket == Int.MaxValue) base
    else {
      require(maxBucket > 0, s"maxBucket must be positive, got $maxBucket")
      val sizes = base.groupBy("bucket").agg(count(lit(1)).as("__bsize"))
      val stride = ceil(col("__bsize").cast("double") / maxBucket).cast("long")
      base.join(broadcast(sizes), "bucket")
        .filter(col("__bsize") <= maxBucket ||
          pmod(Text.h32(concat(col(idCol).cast("string"), lit("_annthin"))), stride) === 0)
        .drop("__bsize")
    }

  /** Occupancy audit companion to [[bucketedTopK]]/[[bucketedTopKMultiProbe]]
    * (mirrors [[Dedup.candidateBucketStats]]): bucket counts split at the
    * `maxBucket` cap, the docs in over-cap buckets, and the worst bucket.
    * A nonzero `hot_buckets` means the guard thinned candidates — raise
    * `planes` or accept the sampled recall.
    */
  def bucketOccupancyStats(df: DataFrame, idCol: String, vecCol: String,
      dim: Int, planes: Int = 8, maxBucket: Int = 1000): DataFrame =
    lshBuckets(df, idCol, vecCol, dim, planes)
      .groupBy("bucket").agg(count(lit(1)).as("sz"))
      .agg(
        sum(when(col("sz") <= maxBucket, 1L).otherwise(0L)).as("ok_buckets"),
        sum(when(col("sz") > maxBucket, 1L).otherwise(0L)).as("hot_buckets"),
        sum(when(col("sz") > maxBucket, col("sz")).otherwise(0L)).as("hot_docs"),
        max(col("sz")).as("max_bucket"))

  def bucketedTopK(df: DataFrame, idCol: String, vecCol: String, dim: Int,
      planes: Int = 8, k: Int = 3, maxBucket: Int = 1000): DataFrame = {
    graft.functions.TopK.requireIntegralId(df.schema, idCol, "bucketedTopK")
    val base = bucketedBase(df, idCol, vecCol, dim, planes)
    val a = base.select(col(idCol).as("query_id"), col("v").as("qv"), col("n").as("qn"), col("bucket"))
    // bucket is functionally dependent on query_id; grouping by both keeps
    // it in the output without a second join
    val cands = a
      .join(neighborSide(thinHotBuckets(base, idCol, maxBucket), idCol),
        col("bucket") === col("bucket2") && col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"), col("bucket"), candCos.as("cos"))
    rankTopK(cands, Seq("query_id", "bucket"), k)
      .select("query_id", "neighbor_id", "bucket", "rnk", "sim")
  }

  /** HARD-negative mining for contrastive training: for each anchor, the
    * k most-similar vectors carrying a DIFFERENT label — the negatives
    * that actually move a contrastive/triplet loss
    * ([[Sampling.negativeSamples]]'s random draws are trivially separable
    * once training converges; hard negatives live at the decision
    * boundary, which is exactly where cosine-similar different-label
    * vectors sit). Candidates come from the RP-LSH bucket equi-join — the
    * [[bucketedTopK]] scale shape, never |corpus|² — with the
    * label-mismatch predicate INSIDE the join, so a same-label neighbor
    * never becomes a candidate row; neighbor-side hot buckets thin at
    * `maxBucket` by the md5 stride ([[thinHotBuckets]]). Null-label rows
    * participate on neither side (a null label can't witness a mismatch),
    * matching SQL's `<>` semantics so the oracle replays verbatim.
    */
  def hardNegatives(df: DataFrame, idCol: String, labelCol: String,
      vecCol: String, dim: Int, planes: Int = 8, k: Int = 3,
      maxBucket: Int = 1000): DataFrame = {
    graft.functions.TopK.requireIntegralId(df.schema, idCol, "hardNegatives")
    // bucketedBase with the label riding along (no second join back)
    val base = df.select(col(idCol), col(labelCol).as("__lbl"),
        asDouble(col(vecCol)).as("v"),
        lshBucket(col(vecCol), dim, planes).as("bucket"))
      .withColumn("n", sqrt(dot(col("v"), col("v"))))
    val a = base.select(col(idCol).as("query_id"), col("__lbl").as("label"),
      col("v").as("qv"), col("n").as("qn"), col("bucket"))
    val b = thinHotBuckets(base, idCol, maxBucket)
      .select(col(idCol).as("neighbor_id"), col("__lbl").as("n_label"),
        col("v").as("cv"), col("n").as("cn"), col("bucket").as("bucket2"))
    val cands = a.join(b,
        col("bucket") === col("bucket2") &&
          col("query_id") =!= col("neighbor_id") &&
          col("label") =!= col("n_label"))
      .select(col("query_id"), col("label"), col("neighbor_id"),
        candCos.as("cos"))
    // label is functionally dependent on query_id; grouping by both keeps
    // it in the output without a join back (the bucketedTopK trick)
    rankTopK(cands, Seq("query_id", "label"), k)
      .select("query_id", "label", "neighbor_id", "rnk", "sim")
  }

  /** Multi-probe variant: each query also probes the `planes` buckets at
    * Hamming distance 1 (one sign bit flipped) — the standard recall
    * booster at a fixed plane count, scanning (planes+1)/2^planes of the
    * corpus instead of 1/2^planes. Candidate generation stays an equi-join
    * on bucket id (the probe list is a per-row explode, never a cross
    * join); duplicate candidates are impossible since each corpus vector
    * lives in exactly one bucket.
    */
  def bucketedTopKMultiProbe(df: DataFrame, idCol: String, vecCol: String, dim: Int,
      planes: Int = 8, k: Int = 3, maxBucket: Int = 1000): DataFrame = {
    graft.functions.TopK.requireIntegralId(df.schema, idCol, "bucketedTopKMultiProbe")
    val base = bucketedBase(df, idCol, vecCol, dim, planes)
    val probes = array(lit(0L) +: (0 until planes).map(p => lit(1L << p)): _*)
    val a = base.select(col(idCol).as("query_id"), col("v").as("qv"), col("n").as("qn"),
      explode(transform(probes, m => col("bucket").bitwiseXOR(m))).as("probe"))
    val cands = a
      .join(neighborSide(thinHotBuckets(base, idCol, maxBucket), idCol),
        col("probe") === col("bucket2") && col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"), candCos.as("cos"))
    rankTopK(cands, Seq("query_id"), k)
      .select("query_id", "neighbor_id", "rnk", "sim")
  }

  /** Per-group mean-pooled embedding (label centroids / chunk-to-doc
    * pooling): element-wise mean over each group's vectors, emitted as
    * (group, dim, mean) rows — the pooling step between chunk-level and
    * doc-level embeddings, and the class-centroid input to
    * nearest-centroid classification.
    *
    * Shape: posexplode → groupBy(group, dim) avg — partial-aggregated
    * sums, shuffle rows = groups × dim (never corpus-sized). Means floored
    * to 1e-6 (sum order over doubles is layout-dependent in the last ulps;
    * the floor makes results comparable across engines and runs).
    */
  def meanPooled(df: DataFrame, groupCol: String, vecCol: String): DataFrame =
    df.select(col(groupCol), posexplode(asDouble(col(vecCol))).as(Seq("dim", "x")))
      .groupBy(groupCol, "dim")
      .agg(floor6(avg("x")).as("mean"), count(lit(1)).as("n"))

  /** Centroid-distance outlier scoring with ENGINE-EXACT arithmetic: score
    * every vector by its squared distance to the corpus centroid and flag
    * the ones beyond `k`× the root-mean-square distance — the standard
    * embedding-space garbage detector (mojibake, truncated inputs, wrong-
    * modality rows land far from the mass) — without a float mean, sqrt,
    * or tolerance anywhere.
    *
    * Arithmetic: vectors quantize to `qv = floor(x·scale)` longs; with
    * n = corpus count and s = Σ qv (per-dim long sums), the score is the
    * integer  D = Σ_j (n·qv_j − s_j)²  = n²·‖qv − centroid‖², and the flag
    * with k = kNum/kDen (a rational — in high d distances concentrate
    * around the RMS, so useful thresholds sit between integer multiples)
    * is  n·D·kDen² > kNum²·ΣD  ⟺  ‖qv−c‖ > k·RMS‖qv−c‖. Products run in
    * DECIMAL(38,0) (DuckDB replays them in HUGEINT): exact up to 10³⁸,
    * which holds to n ≈ 10⁹ vectors at |x| ≤ 10, d ≤ 4096.
    *
    * Shape: one d-bounded moment aggregation (partial-combined posexplode
    * sums, d rows collected — model-bounded, the PCA/IVF pattern), one
    * narrow per-row pass for D (zip_with against the literal sums), one
    * 1-row global ΣD broadcast back. No shuffle is corpus-keyed except the
    * d-row moment reduce.
    *
    * Output: (idCol, d2n — the exact integer D div n = n·‖qv−c‖² (a long;
    * D itself can cross 2⁵³ where a double cast would round), outlier).
    */
  def embeddingOutliers(df: DataFrame, idCol: String, vecCol: String,
      scale: Int = 1000, kNum: Int = 3, kDen: Int = 2): DataFrame = {
    require(scale > 0 && kNum > 0 && kDen > 0,
      s"scale and kNum/kDen must be positive, got $scale, $kNum/$kDen")
    val q = df.select(col(idCol),
      org.apache.spark.sql.graft.VecFns
        .floorScale(asDouble(col(vecCol)), scale).as("__qv"))
    // d rows: per-dimension long sums + the count — model-bounded collect
    val mom = q.select(posexplode(col("__qv")).as(Seq("dim", "v")))
      .groupBy("dim").agg(sum("v").as("s"), count(lit(1)).as("n"))
      .collect().sortBy(_.getAs[Int]("dim"))
    if (mom.isEmpty)
      // empty corpus: no centroid exists — empty result, same schema
      return df.select(col(idCol), lit(0L).as("d2n"), lit(false).as("outlier"))
        .where(lit(false))
    val n = mom.head.getAs[Long]("n")
    val svec = array(mom.map(r => lit(r.getAs[Long]("s"))).toIndexedSeq: _*)
    val dec = "decimal(38,0)"
    val d2 = aggregate(
      zip_with(col("__qv"), svec, (qq, s) => {
        val t = (lit(n) * qq - s).cast(dec)
        t * t
      }),
      lit(0).cast(dec), (acc, t) => acc + t)
    val scored = q.select(col(idCol), d2.as("__d2"))
    val tot = scored.agg(sum(col("__d2")).cast(dec).as("__tot"))
    scored.crossJoin(broadcast(tot))
      .select(col(idCol), expr(s"__d2 div ${n}L").as("d2n"),
        (col("__d2") * lit(n * kDen.toLong * kDen).cast(dec) >
          lit(kNum.toLong * kNum).cast(dec) * col("__tot")).as("outlier"))
  }

  /** SemDeDup-style semantic dedup: cluster embeddings with the exact
    * quantized k-means ([[KMeans.fitAssign]] — deterministic, integer
    * arithmetic, oracle-reproducible), then inside each cluster drop every
    * vector whose cosine to a LOWER-id cluster-mate reaches
    * `simThreshold`. Returns the KEPT ids.
    *
    * The drop rule is a plain EXISTS (not connected components): x is
    * dropped iff some lower-id same-cluster y is similar — the
    * keep-one-representative policy of SemDeDup, deterministic because the
    * id order is total. Cosines are floored to 1e-6 before the threshold
    * compare so both engines make identical keep/drop calls at the
    * boundary.
    *
    * Scale: pairwise work is Σ|cluster|², the SemDeDup design point — k is
    * chosen ∝ corpus size (the paper uses N/k ≈ 10⁴) so clusters stay
    * bounded; the cluster equi-join is the same shuffle shape as the LSH
    * bucket joins, and the anti join at the end is AQE-planned. Prefer
    * [[semanticKeptAuto]], which derives k from the corpus count and
    * REFUSES to run the quadratic step past a cluster-occupancy bound;
    * this fixed-k core takes the same `maxCluster` guard directly.
    *
    * @param maxCluster occupancy bound checked EAGERLY (one k-row agg over
    *                   the materialized assignment) before the Σ|cluster|²
    *                   join is even constructed; a cluster past the bound
    *                   throws with the audit numbers instead of silently
    *                   pinning a reducer. Int.MaxValue disables.
    */
  def semanticKept(df: DataFrame, idCol: String, vecCol: String, k: Int = 8,
      rounds: Int = 2, scale: Int = 1000, simThreshold: Double = 0.4,
      maxCluster: Long = Long.MaxValue): DataFrame = {
    val assignRaw = KMeans.fitAssign(df, vecCol, idCol, k, rounds, scale)
      .select(col(idCol), col("cluster"))
    val assign =
      if (maxCluster == Long.MaxValue) assignRaw
      else {
        // localCheckpoint so the guard's eager agg and the downstream
        // pairwise join share ONE k-means run instead of replaying it
        val mat = assignRaw.localCheckpoint(true)
        val worst = clusterOccupancyStats(mat).collect()(0)
        if (worst.getAs[Long]("max_cluster") > maxCluster)
          throw new IllegalStateException(
            s"semanticKept: largest cluster ${worst.getAs[Long]("max_cluster")} rows " +
              s"exceeds maxCluster=$maxCluster (pair work ~${worst.getAs[Long]("pair_work")}); " +
              "raise k (or targetClusterSize in semanticKeptAuto) before the quadratic step")
        mat
      }
    val base = df.select(col(idCol), asDouble(col(vecCol)).as("v"))
      .withColumn("n", sqrt(dot(col("v"), col("v"))))
      .join(assign, idCol)
    val a = base.select(col(idCol).as("query_id"), col("v").as("qv"),
      col("n").as("qn"), col("cluster"))
    val b = base.select(col(idCol).as("neighbor_id"), col("v").as("cv"),
      col("n").as("cn"), col("cluster").as("cluster2"))
    // the drop rule is an EXISTS — run it as a LEFT SEMI join with the
    // similarity predicate IN the join condition: the hash semi join
    // stops scanning a probe row's cluster-mates at the FIRST lower-id
    // match (a dense dup cluster short-circuits after ~1 dot instead of
    // paying all |cluster| of them), and no pair set is materialized, so
    // the distinct shuffle the inner-join form needed disappears
    val dropped = a.join(b,
        col("cluster") === col("cluster2") && col("neighbor_id") < col("query_id") &&
          floor6(candCos) >= lit(simThreshold), "left_semi")
      .select(col("query_id").as(idCol))
    df.select(col(idCol)).join(dropped, Seq(idCol), "left_anti")
  }

  /** Cluster-occupancy audit for the SemDeDup quadratic step (mirrors
    * [[bucketOccupancyStats]] / [[Dedup.candidateBucketStats]]): cluster
    * count, the largest cluster, and the implied pairwise work Σ|cluster|².
    * `assign` is any (…, cluster) frame, e.g. [[KMeans.fitAssign]] output.
    */
  def clusterOccupancyStats(assign: DataFrame): DataFrame =
    assign.groupBy("cluster").agg(count(lit(1)).as("sz"))
      .agg(count(lit(1)).as("n_clusters"), max(col("sz")).as("max_cluster"),
        sum(col("sz") * col("sz")).as("pair_work"))

  /** [[semanticKept]] with k DERIVED from the corpus count — the scale-safe
    * declared form. SemDeDup's pairwise step is Σ|cluster|², so k must grow
    * with the corpus: k = max(8, ⌈n / targetClusterSize⌉) (the paper's
    * design point is N/k ≈ 10⁴). The cluster-occupancy guard is mandatory
    * here: the quadratic step refuses to run if the largest cluster exceeds
    * maxClusterFactor × targetClusterSize (k-means can still pile a skewed
    * corpus into one cluster no matter how k was chosen — the guard turns
    * that silent reducer-pin into a loud, audited failure).
    *
    * The extra corpus `count()` is one columnar-metadata scan; the
    * quadratic step downstream dwarfs it at every scale.
    */
  def semanticKeptAuto(df: DataFrame, idCol: String, vecCol: String,
      targetClusterSize: Int = 10000, rounds: Int = 2, scale: Int = 1000,
      simThreshold: Double = 0.4, maxClusterFactor: Int = 8): DataFrame = {
    require(targetClusterSize > 0 && maxClusterFactor > 0,
      s"bad targetClusterSize=$targetClusterSize maxClusterFactor=$maxClusterFactor")
    val n = df.count()
    val k = math.max(8L, (n + targetClusterSize - 1) / targetClusterSize)
    require(k <= Int.MaxValue, s"derived k=$k overflows Int")
    semanticKept(df, idCol, vecCol, k.toInt, rounds, scale, simThreshold,
      maxCluster = targetClusterSize.toLong * maxClusterFactor)
  }

  /** Corpus-scaled plane count: the 2^planes bucket space must GROW with
    * the corpus or average occupancy grows linearly and every bucket goes
    * hot — at which point the `maxBucket` skip-cap stops deduplicating
    * entirely (a fixed `planes` is a scale constant pretending to be a
    * parameter). `ceil(log2(n / targetBucket))` holds expected occupancy
    * near `targetBucket`, clamped to [minPlanes, maxPlanes] so test-scale
    * corpora keep the historical 2^8 space (every sf0.01/0.1 oracle
    * replays 8-plane literals) and the bucket id stays well inside a
    * long. Size from the EXPECTED corpus where known — the index bakes
    * the choice in; [[IncrementalEmbeddingDedup.rebucket]] is the
    * migration when the estimate was wrong.
    */
  def planesFor(n: Long, targetBucket: Int = 100, minPlanes: Int = 8,
      maxPlanes: Int = 24): Int = {
    require(targetBucket > 0, s"targetBucket must be > 0, got $targetBucket")
    require(minPlanes >= 1 && maxPlanes >= minPlanes,
      s"need 1 <= minPlanes <= maxPlanes, got $minPlanes/$maxPlanes")
    if (n <= targetBucket) minPlanes
    else {
      val needed = math.ceil(
        math.log(n.toDouble / targetBucket) / math.log(2.0)).toInt
      math.min(maxPlanes, math.max(minPlanes, needed))
    }
  }

  /** [[dropEmbeddingNearDups]] with the plane count derived from the
    * corpus via [[planesFor]] — one extra count() pass buys a bucket
    * space that scales with the data. Identical to the fixed-planes form
    * whenever planesFor lands on the same count (it does at every gate
    * scale, which is what keeps the static 8-plane oracle valid).
    */
  def dropEmbeddingNearDupsAuto(df: DataFrame, idCol: String, vecCol: String,
      dim: Int, targetBucket: Int = 100, minCos: Double = 0.6,
      maxReps: Int = 1000): DataFrame =
    dropEmbeddingNearDups(df, idCol, vecCol, dim,
      planesFor(df.count(), targetBucket), minCos, maxReps)

  /** WITHIN-corpus one-pass embedding near-dup removal — the vector twin
    * of [[Dedup.dropNearDuplicates]]: a row is dropped iff a lower-id
    * REPRESENTATIVE of its RP-LSH bucket — one of the bucket's `maxReps`
    * earliest (lowest-id) members — has floored cosine ≥ `minCos` with
    * it. For buckets of ≤ `maxReps` members every member represents, i.e.
    * the plain "any lower-id bucket-mate" rule; denser buckets verify
    * against the FIXED earliest-member panel, bounding fan-out to
    * `maxReps` per row while still PROCESSING the bucket.
    *
    * Why rank panels replaced the pre-r15 whole-bucket skip-cap: skipping
    * an over-cap bucket exempts exactly the densest DUPLICATE clusters
    * from dedup, and a cluster of (near-)identical vectors projects the
    * same sign on every extra hyperplane — no plane count can ever split
    * it back under a cap (measured at the 100× envelope: max_bucket
    * ~3500 at planes 11, 13 and 14 alike). A rank panel dedups such a
    * cluster fully: every copy matches the cluster's earliest members.
    * Representative sets are PREFIX-STABLE under id-ordered growth — a
    * bucket's K earliest members never change as higher ids arrive —
    * which is what lets [[IncrementalEmbeddingDedup]] store each row's
    * bucket rank at append time and reproduce this form EXACTLY, with no
    * occupancy precondition.
    *
    * The EXISTS runs as a LEFT SEMI with the similarity predicate in the
    * join condition (first match short-circuits; no pair set materializes
    * — the [[semanticKept]] discipline).
    */
  def dropEmbeddingNearDups(df: DataFrame, idCol: String, vecCol: String,
      dim: Int, planes: Int = 8, minCos: Double = 0.6,
      maxReps: Int = 1000): DataFrame = {
    val base = bucketedBase(df, idCol, vecCol, dim, planes)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("bucket").orderBy(idCol)
    val reps = base.withColumn("__rk", row_number().over(w))
      .filter(col("__rk") <= maxReps)
    val a = base.select(col(idCol), col("v").as("qv"), col("n").as("qn"),
      col("bucket"))
    val b = reps.select(col(idCol).as("neighbor_id"), col("v").as("cv"),
      col("n").as("cn"), col("bucket").as("bucket2"))
    val dropped = a.join(b,
        col("bucket") === col("bucket2") && col("neighbor_id") < col(idCol) &&
          floor6(candCos) >= lit(minCos), "left_semi")
      .select(col(idCol))
    df.join(dropped, Seq(idCol), "left_anti")
  }

  /** [[dropEmbeddingNearDups]] over int8-QUANTIZED vectors — the index
    * representation a 100 TB corpus stores (~5-8× smaller than doubles
    * on disk and on every verification fetch). Per-vector scales cancel
    * in the cosine (the [[quantizedCosineTopK]] identity), so `minCos`
    * compares against the same quantity, just computed from integer
    * codes — bucketing AND verification both run on the codes, making
    * the representation self-consistent (a persisted quantized index can
    * re-derive its buckets from what it stores). Kept set differs from
    * the exact form only by quantization error near the thresholds;
    * IncrementalDedupSpec pins the divergence tiny on the corpus.
    */
  def dropEmbeddingNearDupsQuantized(df: DataFrame, idCol: String,
      vecCol: String, dim: Int, planes: Int = 8, minCos: Double = 0.6,
      maxReps: Int = 1000): DataFrame = {
    val q = quantizeInt8(df, idCol, vecCol)
      .select(col(idCol), col("qvec").cast("array<double>").as("__qv"))
    dropEmbeddingNearDups(df.join(q, Seq(idCol)), idCol, "__qv",
      dim, planes, minCos, maxReps).drop("__qv")
  }

  /** Cross-corpus EMBEDDING near-dup gate — the vector twin of
    * [[Dedup.crossCorpusPairs]]: a new crawl's embeddings checked against
    * the retained training corpus WITHOUT |probe|×|ref| work. Both sides
    * bucket under the same deterministic RP-LSH hyperplanes; candidates
    * come from the bucket equi-join (ref-side hot buckets thinned at
    * `maxBucket` by the md5 stride, the [[thinHotBuckets]] contract);
    * verification is the floored cosine against `minCos`. The ref corpus
    * is never modified.
    */
  def crossCorpusEmbeddingPairs(probe: DataFrame, ref: DataFrame,
      idCol: String, vecCol: String, dim: Int, planes: Int = 8,
      minCos: Double = 0.6, maxBucket: Int = 1000): DataFrame = {
    val p = bucketedBase(probe, idCol, vecCol, dim, planes)
      .select(col(idCol).as("probe_id"), col("v").as("qv"),
        col("n").as("qn"), col("bucket"))
    val r = neighborSide(
      thinHotBuckets(bucketedBase(ref, idCol, vecCol, dim, planes), idCol, maxBucket),
      idCol)
    p.join(r, col("bucket") === col("bucket2"))
      .select(col("probe_id"), col("neighbor_id").as("ref_id"),
        floor6(candCos).as("cos"))
      .filter(col("cos") >= minCos)
  }

  /** The removal: probe rows kept after dropping everything with a
    * verified ref near-duplicate. Anti-join strategy left to AQE (the
    * drop set is O(probe) at crawl-refresh overlap rates).
    */
  def dropCrossCorpusEmbeddingDups(probe: DataFrame, ref: DataFrame,
      idCol: String, vecCol: String, dim: Int, planes: Int = 8,
      minCos: Double = 0.6, maxBucket: Int = 1000): DataFrame = {
    val dropped = crossCorpusEmbeddingPairs(probe, ref, idCol, vecCol, dim,
      planes, minCos, maxBucket).select(col("probe_id").as(idCol)).distinct()
    probe.join(dropped, Seq(idCol), "left_anti")
  }

  /** Per-group EXACT embedding diversity — the mean pairwise squared L2
    * distance of a class's vectors, WITHOUT enumerating a single pair:
    *
    *   Σ_{i<j} ‖x_i − x_j‖²  =  n·Σ_i‖x_i‖² − Σ_d (Σ_i x_{id})²
    *
    * (expand the square; the cross terms collapse into per-dimension
    * component sums). Low diversity = a semantically collapsed class — the
    * mixture-weighting / SemDeDup-tuning signal of a curation pipeline,
    * here as one aggregation pass instead of an O(n²) pair join.
    *
    * Arithmetic is integer-exact end-to-end: components are floored to
    * longs (`floor(x·scale)`), the per-group moments (n, Σ‖q‖², Σ_d s_d²)
    * are exact, and the n²-growth products ride DECIMAL(38,0) (= DuckDB
    * HUGEINT). The reported `mean_pair_d2` = total `div` pairs is bounded
    * by the squared class diameter regardless of n, so the OUTPUT column
    * stays long-sized even where the total would not.
    *
    * Scale shape: per-dim sums via posexplode + groupBy (group, dim) with
    * map-side combine — the shuffle is |groups|·d rows after partial
    * aggregation, not n·d; row moments are a second map-side-combined
    * groupBy carrying 3 numbers per group; the final join is
    * |groups|-sized. No collect, no window, no pair materialization.
    * Singletons report pairs=0 and a NULL mean (distinct from a genuine
    * 0 = all-identical class).
    */
  def embeddingDiversity(df: DataFrame, labelCol: String, vecCol: String,
      scale: Int = 1000): DataFrame = {
    require(scale > 0, s"scale must be positive, got $scale")
    val dec = "decimal(38,0)"
    val q = df.filter(col(vecCol).isNotNull).select(col(labelCol),
      org.apache.spark.sql.graft.VecFns
        .floorScale(asDouble(col(vecCol)), scale).as("__qv"))
    val dimSums = q.select(col(labelCol), posexplode(col("__qv")).as(Seq("__d", "__v")))
      .groupBy(labelCol, "__d").agg(sum("__v").as("__s"))
      .groupBy(labelCol)
      .agg(sum(col("__s").cast(dec) * col("__s").cast(dec)).cast(dec).as("__ssq"))
    val rowMoments = q
      .select(col(labelCol),
        aggregate(col("__qv"), lit(0L), (acc, v) => acc + v * v).as("__n2"))
      .groupBy(labelCol)
      .agg(count(lit(1)).as("n"), sum(col("__n2").cast(dec)).cast(dec).as("__sn2"))
    rowMoments.join(dimSums, Seq(labelCol))
      .select(col(labelCol), col("n"),
        (col("n").cast(dec) * col("__sn2") - col("__ssq")).cast(dec).as("__tot"),
        expr("n * (n - 1) div 2").as("pairs"))
      .select(col(labelCol), col("n"), col("pairs"),
        when(col("pairs") > 0, expr("cast(__tot div pairs as bigint)")).as("mean_pair_d2"))
  }
}
