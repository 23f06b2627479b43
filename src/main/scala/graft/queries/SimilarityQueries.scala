package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, count, flatten, lit, max, pmod, sequence, transform}
import graft.Tables
import graft.ops.Similarity

/** Similarity-search query surface over `embeddings` (64-dim float vectors):
  * brute-force cosine top-k (correctness baseline) and sign-random-projection
  * LSH (the scale path). The oracle embeds the IDENTICAL hyperplane literals
  * the Scala side derives from md5, so buckets reproduce exactly.
  */
object SimilarityQueries extends QueryModule {

  private val Dim = 64
  private val Planes = 8

  /** emb_pca_project_wide widening: 32 tiles of the 64-dim embedding →
    * d=2048, past [[graft.ops.Pca.MaxEigenDim]] so fit exercises the
    * subspace eigensolver.
    */
  private val WideTiles = 32
  private val WideDim = Dim * WideTiles

  /** Cap for the *_capped queries — small enough that sf0.01's largest
    * buckets (size 8) get thinned, so the oracle proves the stride exactly.
    */
  private val CapSmall = 4

  private def emb(s: SparkSession, d: String): DataFrame = Tables.embeddings(s, d)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ann_topk_cosine" -> ((s, d) => {
      val e = emb(s, d)
      Similarity.cosineTopK(e, e.filter(col("vec_id") < 10), "vec_id", "embedding", k = 5)
    }),
    // int8-quantized brute force: scales cancel in the cosine, so scores
    // are exact integer dot products — oracle-stable at any summation order
    "ann_quantized_topk" -> ((s, d) => {
      val e = emb(s, d)
      Similarity.quantizedCosineTopK(e, e.filter(col("vec_id") < 10),
        "vec_id", "embedding", k = 5)
    }),
    "ann_lsh_buckets" -> ((s, d) =>
      Similarity.lshBuckets(emb(s, d), "vec_id", "embedding", Dim, Planes)),
    // the UNTHINNED declared queries disable the hot-bucket guard
    // EXPLICITLY (Int.MaxValue): their oracles are unthinned SQL, and an
    // implicit default cap would silently diverge the moment a verification
    // corpus grows a 1000-row bucket. The *_capped twins below prove the
    // guarded path; library callers get the documented default cap.
    "ann_bucket_topk" -> ((s, d) =>
      Similarity.bucketedTopK(emb(s, d), "vec_id", "embedding", Dim, Planes, k = 3,
        maxBucket = Int.MaxValue)),
    "ann_multiprobe_topk" -> ((s, d) =>
      Similarity.bucketedTopKMultiProbe(emb(s, d), "vec_id", "embedding", Dim, Planes,
        k = 3, maxBucket = Int.MaxValue)),
    // hard-negative mining: per anchor, the 3 most-similar DIFFERENT-label
    // vectors — the contrastive-training feed (random negatives are
    // trivially separable; these sit at the decision boundary). Guard
    // explicitly OFF like every unthinned declared query.
    "ann_hard_negatives" -> ((s, d) =>
      Similarity.hardNegatives(emb(s, d), "vec_id", "label", "embedding",
        Dim, Planes, k = 3, maxBucket = Int.MaxValue)),
    // deliberately tiny cap (sf0.01 buckets reach size 8): the md5 thinning
    // stride FIRES here, and the oracle reproduces it predicate-for-predicate
    // — proof the guard's results stay engine-exact, not just bounded
    "ann_bucket_topk_capped" -> ((s, d) =>
      Similarity.bucketedTopK(emb(s, d), "vec_id", "embedding", Dim, Planes,
        k = 3, maxBucket = CapSmall)),
    "ann_multiprobe_topk_capped" -> ((s, d) =>
      Similarity.bucketedTopKMultiProbe(emb(s, d), "vec_id", "embedding", Dim, Planes,
        k = 3, maxBucket = CapSmall)),
    // recall@3 of the multi-probe LSH path vs the exact top-3, on the
    // vec_id % 10 == 0 probe sample (the audit's cost knob) — the gate
    // that keeps a production ANN index honest
    "ann_recall_audit" -> ((s, d) => {
      val e = emb(s, d)
      val probes = e.filter(pmod(col("vec_id"), lit(10)) === 0)
      Similarity.recallAtK(
        Similarity.cosineTopK(e, probes, "vec_id", "embedding", k = 3),
        Similarity.bucketedTopKMultiProbe(e, "vec_id", "embedding", Dim, Planes,
            k = 3, maxBucket = Int.MaxValue)
          .filter(pmod(col("query_id"), lit(10)) === 0))
    }),

    // embedding-cosine near-dup pairs, candidates bounded by LSH bucket
    // (threshold tuned to the synthetic corpus where max pair cosine ~0.51);
    // guard explicitly OFF — unthinned oracle, same contract as above
    "dedup_embedding_neardup" -> ((s, d) =>
      Similarity.bucketedTopK(emb(s, d), "vec_id", "embedding", Dim, Planes, k = 50,
          maxBucket = Int.MaxValue)
        .filter(col("sim") >= 0.4)
        .filter(col("query_id") < col("neighbor_id"))
        .select(col("query_id").as("vec_a"), col("neighbor_id").as("vec_b"), col("sim"))),

    // exact quantized k-means: every assignment reproducible bit-for-bit
    // (integer distances, floored integer centroid updates — no float
    // accumulation anywhere, so no cross-engine tie-break drift)
    "emb_kmeans_assign" -> ((s, d) =>
      graft.ops.KMeans.fitAssign(emb(s, d), "embedding", "vec_id",
        k = 8, rounds = 2, scale = 1000)),

    // chunk→doc / class-centroid pooling: element-wise mean per label
    "emb_mean_pool" -> ((s, d) =>
      Similarity.meanPooled(emb(s, d), "label", "embedding")),

    // centroid-distance outlier gate, integer-exact end to end. The
    // synthetic embeddings concentrate hard around the RMS distance
    // (spread ≈ ±2% — the high-d concentration the op's doc describes),
    // so the declared threshold is k = 101/100 to keep BOTH flag branches
    // live in the gate data (26 true / 474 false at sf0.01); a real
    // corpus gate would run the default 3/2.
    "emb_outliers" -> ((s, d) =>
      Similarity.embeddingOutliers(emb(s, d), "vec_id", "embedding",
        scale = 1000, kNum = 101, kDen = 100)),

    // per-class semantic diversity — exact mean pairwise squared L2 via the
    // moment identity (n·Σ‖x‖² − Σ_d s_d²), ONE aggregation pass, zero
    // pair enumeration; the mixture-weighting / SemDeDup-tuning signal
    "emb_diversity" -> ((s, d) =>
      Similarity.embeddingDiversity(emb(s, d), "label", "embedding",
        scale = 1000)),

    // the SemDeDup tuning view end-to-end: diversity per LEARNED cluster
    // (exact k-means ∘ moment-identity diversity) — a collapsed cluster
    // (low mean_pair_d2) is where semantic dedup will bite hardest
    "emb_cluster_diversity" -> ((s, d) => {
      val e = emb(s, d)
      val assigned = graft.ops.KMeans.fitAssign(e, "embedding", "vec_id",
        k = 8, rounds = 2, scale = 1000).select(col("vec_id"), col("cluster"))
      Similarity.embeddingDiversity(
        assigned.join(e.select(col("vec_id"), col("embedding")), Seq("vec_id")),
        "cluster", "embedding", scale = 1000)
    }),

    // cross-corpus EMBEDDING dedup: odd vec_ids are the "new crawl",
    // even the retained corpus; bucket equi-join candidates, floored
    // cosine verify. 0.3 is the related-band on this near-uniform
    // synthetic corpus (13 of 250 probes drop — both outcomes live); a
    // real embedding space runs 0.9+
    "dedup_cross_emb_pairs" -> ((s, d) => {
      val e = emb(s, d)
      Similarity.crossCorpusEmbeddingPairs(
        e.filter(pmod(col("vec_id"), lit(2)) === 1),
        e.filter(pmod(col("vec_id"), lit(2)) === 0),
        "vec_id", "embedding", Dim, Planes, minCos = 0.3)
    }),
    "dedup_cross_emb_kept" -> ((s, d) => {
      val e = emb(s, d)
      Similarity.dropCrossCorpusEmbeddingDups(
        e.filter(pmod(col("vec_id"), lit(2)) === 1),
        e.filter(pmod(col("vec_id"), lit(2)) === 0),
        "vec_id", "embedding", Dim, Planes, minCos = 0.3)
        .select("vec_id")
    }),
    // READ-ONLY index probe (r16), embedding twin: the even half is
    // indexed once, the odd half filtered with probe() — no write, no
    // batch id, no id-order condition (cross-corpus semantics). Partners
    // are the stored rank<=1000 panel per bucket; the oracle re-derives
    // that panel in window SQL.
    "dedup_incr_emb_probe_kept" -> ((s, d) => {
      val e = emb(s, d)
      val indexDir = java.nio.file.Paths.get(
        System.getProperty("java.io.tmpdir"), "graft_incrembprobe",
        d.replaceAll("[^A-Za-z0-9]", "_")).toString
      val fs = new org.apache.hadoop.fs.Path(indexDir)
        .getFileSystem(s.sparkContext.hadoopConfiguration)
      fs.delete(new org.apache.hadoop.fs.Path(indexDir), true)
      // eagerResult=false (r22): the kept frame of the index-build step is
      // DISCARDED here — lazy mode skips its checkpoint job entirely (the
      // index appends still run eagerly)
      graft.ops.IncrementalEmbeddingDedup.addBatch(s, indexDir,
        e.filter(pmod(col("vec_id"), lit(2)) === 0), "embedding", "vec_id",
        batchId = 0, dim = Dim, planes = Planes, minCos = 0.3,
        eagerResult = false)
      // lazy-result variant (r20): single-shot oracle/bench path — the
      // eager default's checkpoint would leak behind this .select
      graft.ops.IncrementalEmbeddingDedup.probe(s, indexDir,
        e.filter(pmod(col("vec_id"), lit(2)) === 1), "embedding", "vec_id",
        dim = Dim, planes = Planes, minCos = 0.3, eagerResult = false)
        .select("vec_id")
    }),
    // guard-FIRING fixture: maxBucket=1 makes every multi-occupant ref
    // bucket hot, so the md5-stride keep predicate (thinHotBuckets) is
    // exercised and oracle-pinned — the default-cap twins above never trip
    // it at test scale, which would leave the stride's oracle equivalence
    // unproven (every thinning stride must be proven exact where it fires)
    "dedup_cross_emb_pairs_thinned" -> ((s, d) => {
      val e = emb(s, d)
      Similarity.crossCorpusEmbeddingPairs(
        e.filter(pmod(col("vec_id"), lit(2)) === 1),
        e.filter(pmod(col("vec_id"), lit(2)) === 0),
        "vec_id", "embedding", Dim, Planes, minCos = 0.3, maxBucket = 1)
    }),

    // WITHIN-corpus embedding near-dedup, one-pass batch form: lower-id
    // RP-LSH bucket-mate with floored cosine ≥ 0.3 drops the row (whole
    // over-cap buckets skipped — the minhash cap style, reproducible
    // incrementally). AUTO bucket space: planesFor(n) keeps 2^planes
    // tracking the corpus — 8 at every oracle scale (the static 8-plane
    // bucketExpr stays valid), 11 at the 100× envelope where the fixed
    // space used to saturate
    "dedup_emb_kept" -> ((s, d) =>
      Similarity.dropEmbeddingNearDupsAuto(emb(s, d), "vec_id", "embedding",
        Dim, targetBucket = 100, minCos = 0.3).select("vec_id")),

    // the INCREMENTAL twin: three id-ordered batches against a persisted
    // RP-LSH index (ops/IncrementalEmbeddingDedup — the corpus is never
    // re-projected); equals the one-pass policy under id-ordered batches,
    // so the oracle is dedup_emb_kept's SQL verbatim. Index wiped per run.
    "dedup_incr_emb_kept" -> ((s, d) => {
      val e = emb(s, d)
      val indexDir = java.nio.file.Paths.get(
        System.getProperty("java.io.tmpdir"), "graft_incrembdedup",
        d.replaceAll("[^A-Za-z0-9]", "_")).toString
      val fs = new org.apache.hadoop.fs.Path(indexDir)
        .getFileSystem(s.sparkContext.hadoopConfiguration)
      fs.delete(new org.apache.hadoop.fs.Path(indexDir), true)
      val mRow = e.agg(max(col("vec_id")), count(lit(1))).head // 1-row model read
      if (mRow.isNullAt(0)) e.select("vec_id") // empty corpus: nothing kept
      else {
        val m = mRow.getLong(0)
        // the index bakes planes in, so size the bucket space ONCE from
        // the FULL corpus (what a production pipeline does from its
        // expected scale), not per-batch — per-batch sizing would give
        // batch 0 a smaller space than the batch form and break the
        // shared-oracle equality. 8 at every oracle scale, 11 at 100×.
        val planes = Similarity.planesFor(mRow.getLong(1), targetBucket = 100)
        val batches = Seq(
          e.filter(col("vec_id") <= m / 3),
          e.filter(col("vec_id") > m / 3 && col("vec_id") <= 2 * m / 3),
          e.filter(col("vec_id") > 2 * m / 3))
        batches.zipWithIndex.map { case (b, i) =>
          // eagerResult=false (r22): single-shot bench/oracle consumer —
          // the three batches' kept pipelines evaluate together in the
          // harness's one action instead of three checkpoint jobs
          graft.ops.IncrementalEmbeddingDedup.addBatch(s, indexDir, b,
            "embedding", "vec_id", batchId = i, dim = Dim, planes = planes,
            minCos = 0.3, eagerResult = false).select("vec_id")
        }.reduce(_ unionByName _)
      }
    }),

    // the QUANTIZED layout twins: int8 codes are what a 100 TB index
    // stores (~5-8× cut); scales cancel in the cosine so bucketing AND
    // verification run on the codes — a self-consistent representation
    // with its own oracle that replays the quantization expression-by-
    // expression (the ann_quantized_topk discipline)
    "dedup_emb_kept_q8" -> ((s, d) =>
      Similarity.dropEmbeddingNearDupsQuantized(emb(s, d), "vec_id",
        "embedding", Dim, Planes, minCos = 0.3).select("vec_id")),

    "dedup_incr_emb_kept_q8" -> ((s, d) => {
      val e = emb(s, d)
      val indexDir = java.nio.file.Paths.get(
        System.getProperty("java.io.tmpdir"), "graft_incrembdedupq8",
        d.replaceAll("[^A-Za-z0-9]", "_")).toString
      val fs = new org.apache.hadoop.fs.Path(indexDir)
        .getFileSystem(s.sparkContext.hadoopConfiguration)
      fs.delete(new org.apache.hadoop.fs.Path(indexDir), true)
      val mRow = e.agg(max(col("vec_id"))).head
      if (mRow.isNullAt(0)) e.select("vec_id")
      else {
        val m = mRow.getLong(0)
        val batches = Seq(
          e.filter(col("vec_id") <= m / 3),
          e.filter(col("vec_id") > m / 3 && col("vec_id") <= 2 * m / 3),
          e.filter(col("vec_id") > 2 * m / 3))
        batches.zipWithIndex.map { case (b, i) =>
          graft.ops.IncrementalEmbeddingDedup.addBatch(s, indexDir, b,
            "embedding", "vec_id", batchId = i, dim = Dim, planes = Planes,
            minCos = 0.3, quantized = true, eagerResult = false)
            .select("vec_id")
        }.reduce(_ unionByName _)
      }
    }),

    // SemDeDup: k-means clusters → within-cluster lower-id cosine EXISTS →
    // kept ids (composes the oracle-exact k-means with pairwise cosine).
    // The AUTO form derives k = max(8, ceil(n/10^4)) — 8 for every corpus
    // up to 80k vectors, so the static k=8 oracle matches at the driver's
    // verification scales — and runs the mandatory cluster-occupancy guard
    // before the quadratic step.
    "dedup_semantic_kept" -> ((s, d) =>
      Similarity.semanticKeptAuto(emb(s, d), "vec_id", "embedding",
        targetClusterSize = 10000, rounds = 2, scale = 1000, simThreshold = 0.4)),

    // SemDeDup end-to-end as the paper runs it: PCA-whiten → cluster →
    // within-cluster dedup. Fit k=4 components (persisted — the oracle
    // replays the whitening from the same parquet doubles), whiten
    // per-row against literal component arrays (no join, no shuffle),
    // then the same auto-k semanticKept over the whitened vectors.
    // Threshold 0.8: whitened cosines de-emphasize the dominant raw
    // directions, so near-dups must agree across ALL unit-variance axes.
    "dedup_semantic_whitened" -> ((s, d) => {
      val e = emb(s, d)
      val model = graft.ops.Pca.fit(e, "embedding", Dim, k = 4, scale = 1000)
      graft.ops.Pca.save(model, s, pcaFixture(d))
      val loaded = graft.ops.Pca.load(s, pcaFixture(d))
      // the static oracle's k-means block indexes wvec[1..4]: whitenVector
      // DROPS dead (λ ≤ 1e-12) components, so a corpus with a dead
      // direction would hand the oracle a 3-element wvec and NULL
      // coordinates — fail loudly HERE instead of silently diverging
      require(loaded.eigenvalues.forall(_ > 1e-12),
        s"dedup_semantic_whitened: dead component in fitted model " +
          s"(eigenvalues=${loaded.eigenvalues.mkString(",")}) — the static " +
          "oracle assumes all 4 components are live")
      // materialize the (corpus × 4 doubles) whitened frame ONCE: the
      // iterative consumer (count + k-means rounds + both pairwise sides +
      // final anti join) would otherwise recompute the 64-dim projection
      // ~7× — and the k-narrow result is far cheaper to hold than to replay
      val w = graft.ops.Pca.whitenVector(e, "vec_id", "embedding", loaded)
        .localCheckpoint(true)
      Similarity.semanticKeptAuto(w, "vec_id", "wvec",
        targetClusterSize = 10000, rounds = 2, scale = 1000, simThreshold = 0.8)
    }),

    // one-pass covariance sums (micro-quantized → exact integers), the
    // distributed half of PCA — every value engine- and layout-exact
    "emb_covariance" -> ((s, d) =>
      graft.ops.Pca.covarianceSums(emb(s, d), "embedding", Dim, scale = 1000)),

    // PCA lifecycle end-to-end: fit (integer covariance + driver Jacobi) →
    // persist → reload → project. The oracle replays the projection from
    // the SAME persisted mean/components parquet (the Ivf pattern), so
    // centering, dot order, and the 6dp floor are all pinned.
    "emb_pca_project" -> ((s, d) => {
      val e = emb(s, d)
      val model = graft.ops.Pca.fit(e, "embedding", Dim, k = 4, scale = 1000)
      graft.ops.Pca.save(model, s, pcaFixture(d))
      graft.ops.Pca.project(e, "vec_id", "embedding", graft.ops.Pca.load(s, pcaFixture(d)))
    }),

    // the d > MaxEigenDim(=1024) fit path: the 64-dim embeddings widened
    // deterministically to 2048 dims (32 tiles, tile t scaled 1 + t/10 —
    // expressible identically in DuckDB), fit k=4 through the SUBSPACE
    // power-iteration eigensolver (full Jacobi would be O(d³) driver
    // sweeps), persist, project. The oracle replays the projection from
    // the persisted parquet doubles — eigensolver accuracy is PcaSpec's
    // job; this row pins the distributed covariance + projection lifecycle
    // at embedding-model width.
    "emb_pca_project_wide" -> ((s, d) => {
      val wide = emb(s, d).select(col("vec_id"),
        flatten(transform(sequence(lit(0), lit(WideTiles - 1)), t =>
          transform(col("embedding"),
            x => x.cast("double") * (lit(1.0) + t.cast("double") / 10.0)))).as("wide"))
      val model = graft.ops.Pca.fit(wide, "wide", WideDim, k = 4, scale = 1000)
      graft.ops.Pca.save(model, s, pcaWideFixture(d))
      graft.ops.Pca.project(wide, "vec_id", "wide", graft.ops.Pca.load(s, pcaWideFixture(d)))
    }),

    // whitened projection from the same persisted model: proj/sqrt(λ),
    // the unit-variance embedding SemDeDup-style pipelines feed to cosine
    "emb_pca_whiten" -> ((s, d) => {
      val e = emb(s, d)
      val model = graft.ops.Pca.fit(e, "embedding", Dim, k = 4, scale = 1000)
      graft.ops.Pca.save(model, s, pcaFixture(d))
      graft.ops.Pca.whiten(e, "vec_id", "embedding", graft.ops.Pca.load(s, pcaFixture(d)))
    }),

    // IVF lifecycle end-to-end: build → persist → reload → probed search.
    // The oracle replays the search (probe ranking + ranked cosine) from
    // the SAME persisted index parquet, so list assignment, probe order,
    // and ranking are all pinned — k-means itself isn't SQL-expressible,
    // but the index it produces is data the oracle can verify against.
    "ivf_topk" -> ((s, d) => {
      val e = emb(s, d)
      val idx = graft.ops.Ivf.build(e, "vec_id", "embedding", nlist = 8)
      graft.ops.Ivf.save(idx, s, ivfFixture(d))
      val loaded = graft.ops.Ivf.load(s, ivfFixture(d))
      graft.ops.Ivf.search(loaded, e.filter(col("vec_id") % 10 === 0),
        "vec_id", "embedding", k = 5, nprobe = 2)
    }))

  /** Persisted-model fixture paths, KEYED BY THE SF DIR: the fixture is
    * rewritten by the query on every run, and a single fixed path would
    * let a later run at a DIFFERENT scale (e.g. the sf0.1 bench, whose
    * set includes the PCA queries) silently overwrite the model the
    * static oracle replays — a correctness gate that depends on run
    * ordering. The oracle SQL pins the sf0.01 key, the scale the driver
    * verifies at (TESTDATA.md contract; tools/check_oracle.py likewise).
    */
  private def fixturePath(base: String, d: String): String = Fixtures.path(base, d)
  private def ivfFixture(d: String): String = fixturePath("/tmp/graft_ivf_fixture", d)
  private def pcaFixture(d: String): String = fixturePath("/tmp/graft_pca_fixture", d)
  private def pcaWideFixture(d: String): String = fixturePath("/tmp/graft_pca_wide_fixture", d)
  private val OracleSf = Fixtures.OracleSf
  private val IvfFixture = ivfFixture(OracleSf)
  private val PcaFixture = pcaFixture(OracleSf)
  private val PcaWideFixture = pcaWideFixture(OracleSf)

  /** DuckDB literal for hyperplane p (exact same doubles as the Scala side:
    * Double.toString round-trips bit-exactly through DuckDB's parser).
    */
  private def hpLit(p: Int): String =
    Similarity.hyperplane(p, Dim).mkString("[", ", ", "]::DOUBLE[]")

  private val bucketExpr: String =
    (0 until Planes).map { p =>
      s"(CASE WHEN list_dot_product(v, ${hpLit(p)}) >= 0 THEN ${1L << p} ELSE 0 END)"
    }.mkString(" +\n    ")

  /** The ref-side [[graft.ops.Similarity.thinHotBuckets]] stride as a CTE:
    * `rk` = rows of `rb` kept by "bucket under cap, OR portable
    * h32(id·'_annthin') lands on the ceil(size/cap) stride". This is the
    * op's actual hot-bucket semantics (a deterministic SAMPLE of hot
    * buckets, not a whole-bucket drop), replayed term-for-term: DuckDB's
    * `('0x'||substr(md5(s),1,8))::BIGINT` is exactly Spark's
    * `conv(substring(md5(s),1,8),16,10)`, and both sides stride with
    * `ceil(size/cap)` on nonnegative hashes (pmod ≡ % there).
    */
  private def thinStrideCte(cap: Int): String =
    s"""bs AS (SELECT bucket, count(*)::BIGINT AS bsize FROM rb GROUP BY bucket),
       |rk AS (SELECT rb.* FROM rb JOIN bs USING (bucket)
       |       WHERE bs.bsize <= $cap
       |          OR ('0x' || substr(md5(rb.vec_id::VARCHAR || '_annthin'), 1, 8))::BIGINT
       |             % ceil(bs.bsize::DOUBLE / $cap)::BIGINT = 0)""".stripMargin

  private def crossEmbPairsSql(cap: Int): String =
    s"""WITH e AS (
       |  SELECT vec_id, embedding::DOUBLE[] AS v,
       |         sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS nrm,
       |         ($bucketExpr)::BIGINT AS bucket
       |  FROM (SELECT vec_id, embedding::DOUBLE[] AS v, embedding FROM embeddings)),
       |pb AS (SELECT * FROM e WHERE vec_id % 2 = 1),
       |rb AS (SELECT * FROM e WHERE vec_id % 2 = 0),
       |${thinStrideCte(cap)},
       |pr AS (SELECT p.vec_id AS probe_id, r.vec_id AS ref_id,
       |        floor((CASE WHEN p.nrm * r.nrm > 0
       |               THEN list_dot_product(p.v, r.v) / (p.nrm * r.nrm)
       |               ELSE 0 END) * 1000000) / 1000000.0 AS cos
       |       FROM pb p JOIN rk r ON p.bucket = r.bucket)
       |SELECT probe_id, ref_id, cos FROM pr WHERE cos >= 0.3""".stripMargin

  /** Unrolled-Lloyd k-means oracle mirroring [[graft.ops.KMeans.fitAssign]]
    * CTE-block by CTE-block: quantize → init (k smallest ids) → per round
    * (argmin assign with (d2, c) tie-break, per-(cluster,dim) integer sums,
    * floored-division centroid rebuild, empty-cluster fallback) → final
    * assign. All-integer, so equality is exact, not approximate.
    */
  private def kmeansSql(k: Int, rounds: Int, scale: Int, dim: Int = Dim,
      src: String = "embeddings", vecCol: String = "embedding"): String = {
    def assignCte(name: String, centsRel: String): String =
      s"""d_$name AS (
         |  SELECT q.vec_id, i.c,
         |    list_sum(list_transform(range($dim),
         |      j -> (q.qv[j+1] - i.cent[j+1]) * (q.qv[j+1] - i.cent[j+1])))::BIGINT AS d2
         |  FROM qz q CROSS JOIN $centsRel i),
         |$name AS (
         |  SELECT vec_id, c, d2 FROM (
         |    SELECT vec_id, c, d2,
         |           row_number() OVER (PARTITION BY vec_id ORDER BY d2, c) AS rn
         |    FROM d_$name) WHERE rn = 1)""".stripMargin
    def updateCte(r: Int, assignRel: String, prevRel: String): String =
      s"""s_$r AS (
         |  SELECT a.c, d.j AS dim, sum(q.qv[d.j+1])::BIGINT AS sv, count(*)::BIGINT AS n
         |  FROM $assignRel a JOIN qz q USING (vec_id)
         |  CROSS JOIN (SELECT unnest(range($dim)) AS j) d
         |  GROUP BY a.c, d.j),
         |u_$r AS (
         |  SELECT c, list(floor(sv::DOUBLE / n::DOUBLE)::BIGINT ORDER BY dim) AS cent
         |  FROM s_$r GROUP BY c),
         |cents_$r AS (
         |  SELECT i.c, coalesce(u.cent, i.cent) AS cent
         |  FROM $prevRel i LEFT JOIN u_$r u ON u.c = i.c)""".stripMargin
    val roundCtes = (1 to rounds).map { r =>
      assignCte(s"a_$r", s"cents_${r - 1}") + ",\n" + updateCte(r, s"a_$r", s"cents_${r - 1}")
    }.mkString(",\n")
    s"""WITH qz AS (
       |  SELECT vec_id,
       |         list_transform($vecCol, x -> floor(x::DOUBLE * $scale)::BIGINT) AS qv
       |  FROM $src),
       |i0 AS (SELECT vec_id, qv FROM qz ORDER BY vec_id LIMIT $k),
       |cents_0 AS (
       |  SELECT row_number() OVER (ORDER BY vec_id) - 1 AS c, qv AS cent FROM i0),
       |$roundCtes,
       |${assignCte("a_final", s"cents_$rounds")}
       |SELECT vec_id, c AS cluster, d2 FROM a_final""".stripMargin
  }

  /** Within-corpus embedding near-dedup kept set — same hyperplane
    * literals and floored cosine as the cross-corpus oracles; a row drops
    * iff a lower-id RANK REPRESENTATIVE of its bucket (one of the 1000
    * earliest members by id) is within the cosine threshold. For every
    * bucket of ≤ 1000 members — i.e. every bucket at every oracle scale —
    * the rank predicate is vacuous and this is the plain lower-id
    * bucket-mate rule; at 100× the rank panel is what lets dense
    * duplicate clusters dedup instead of being skip-capped (engine doc:
    * Similarity.dropEmbeddingNearDups).
    */
  private lazy val embKeptSql =
    s"""WITH e AS (
       |  SELECT vec_id, embedding::DOUBLE[] AS v,
       |         sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS nrm,
       |         ($bucketExpr)::BIGINT AS bucket
       |  FROM (SELECT vec_id, embedding::DOUBLE[] AS v, embedding FROM embeddings)),
       |r AS (SELECT vec_id, v, nrm, bucket,
       |             row_number() OVER (PARTITION BY bucket ORDER BY vec_id) AS rk
       |      FROM e),
       |dropped AS (SELECT DISTINCT a.vec_id
       |            FROM e a JOIN r b ON a.bucket = b.bucket AND b.vec_id < a.vec_id
       |                              AND b.rk <= 1000
       |            WHERE floor((CASE WHEN a.nrm * b.nrm > 0
       |                   THEN list_dot_product(a.v, b.v) / (a.nrm * b.nrm)
       |                   ELSE 0 END) * 1000000) / 1000000.0 >= 0.3)
       |SELECT vec_id FROM embeddings
       |WHERE vec_id NOT IN (SELECT vec_id FROM dropped)""".stripMargin

  /** The quantized twins' kept set: the int8 quantization replayed
    * expression-by-expression (floor(x+0.5) round, ±127 clamp — the
    * `ann_quantized_topk` discipline), then the SAME rank-form dedup
    * block over the integer codes. Integer dots are exact in doubles, so
    * the floored cosine is engine-stable by construction.
    */
  private lazy val embKeptQ8Sql =
    s"""WITH qz AS (
       |  SELECT vec_id,
       |    CASE WHEN maxabs > 0
       |         THEN list_transform(v0, x -> greatest(-127, least(127,
       |                floor(x * 127.0 / maxabs + 0.5)::BIGINT)))
       |         ELSE list_transform(v0, x -> 0::BIGINT) END AS q
       |  FROM (SELECT vec_id, v0, list_max(list_transform(v0, x -> abs(x))) AS maxabs
       |        FROM (SELECT vec_id, embedding::DOUBLE[] AS v0 FROM embeddings))),
       |e AS (
       |  SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm,
       |         ($bucketExpr)::BIGINT AS bucket
       |  FROM (SELECT vec_id, q::DOUBLE[] AS v FROM qz)),
       |r AS (SELECT vec_id, v, nrm, bucket,
       |             row_number() OVER (PARTITION BY bucket ORDER BY vec_id) AS rk
       |      FROM e),
       |dropped AS (SELECT DISTINCT a.vec_id
       |            FROM e a JOIN r b ON a.bucket = b.bucket AND b.vec_id < a.vec_id
       |                              AND b.rk <= 1000
       |            WHERE floor((CASE WHEN a.nrm * b.nrm > 0
       |                   THEN list_dot_product(a.v, b.v) / (a.nrm * b.nrm)
       |                   ELSE 0 END) * 1000000) / 1000000.0 >= 0.3)
       |SELECT vec_id FROM embeddings
       |WHERE vec_id NOT IN (SELECT vec_id FROM dropped)""".stripMargin

  val oracle: Map[String, String] = Map(
    "dedup_emb_kept_q8" -> embKeptQ8Sql,
    "dedup_incr_emb_kept_q8" -> embKeptQ8Sql,

    "emb_kmeans_assign" -> kmeansSql(k = 8, rounds = 2, scale = 1000),

    // integer-exact: same micro quantization, same sums — no tolerance
    "emb_covariance" ->
      s"""WITH q AS (
         |  SELECT list_transform(embedding, x -> floor(x::DOUBLE * 1000)::BIGINT) AS qv
         |  FROM embeddings),
         |pairs AS (
         |  SELECT a.i, b.j
         |  FROM (SELECT unnest(range($Dim)) AS i) a,
         |       (SELECT unnest(range($Dim)) AS j) b
         |  WHERE b.j >= a.i)
         |SELECT p.i::INT AS i, p.j::INT AS j, count(*)::BIGINT AS n,
         |       sum(qv[p.i + 1])::BIGINT AS s_i,
         |       sum(qv[p.j + 1])::BIGINT AS s_j,
         |       sum(qv[p.i + 1] * qv[p.j + 1])::BIGINT AS sp
         |FROM q CROSS JOIN pairs p
         |GROUP BY p.i, p.j""".stripMargin,

    // same replay with the persisted eigenvalue's sqrt in the divisor
    "emb_pca_whiten" ->
      s"""WITH m AS (SELECT mean FROM read_parquet('$PcaFixture/current/mean/*.parquet')),
         |c AS (SELECT comp_id, eigenvalue, vec
         |      FROM read_parquet('$PcaFixture/current/components/*.parquet')),
         |e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings)
         |SELECT e.vec_id, c.comp_id,
         |  CASE WHEN c.eigenvalue > 1e-12 THEN
         |    floor(list_dot_product(
         |            list_transform(range($Dim), i -> e.v[i + 1] - m.mean[i + 1]),
         |            c.vec) / sqrt(c.eigenvalue) * 1000000) / 1000000.0
         |  END AS white
         |FROM e CROSS JOIN m CROSS JOIN c""".stripMargin,

    // projection replayed from the persisted model: centering uses the
    // exact parquet doubles, the dot is the same left-to-right fold
    "emb_pca_project" ->
      s"""WITH m AS (SELECT mean FROM read_parquet('$PcaFixture/current/mean/*.parquet')),
         |c AS (SELECT comp_id, vec FROM read_parquet('$PcaFixture/current/components/*.parquet')),
         |e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings)
         |SELECT e.vec_id, c.comp_id,
         |  floor(list_dot_product(
         |          list_transform(range($Dim), i -> e.v[i + 1] - m.mean[i + 1]),
         |          c.vec) * 1000000) / 1000000.0 AS proj
         |FROM e CROSS JOIN m CROSS JOIN c""".stripMargin,

    // the wide (d=2048) lifecycle replayed the same way: identical
    // deterministic widening on both sides, projection from the persisted
    // wide-model parquet doubles
    "emb_pca_project_wide" ->
      s"""WITH m AS (SELECT mean FROM read_parquet('$PcaWideFixture/current/mean/*.parquet')),
         |c AS (SELECT comp_id, vec FROM read_parquet('$PcaWideFixture/current/components/*.parquet')),
         |e AS (SELECT vec_id,
         |        flatten(list_transform(range($WideTiles), t ->
         |          list_transform(embedding, x -> x::DOUBLE * (1 + t / 10.0)))) AS v
         |      FROM embeddings)
         |SELECT e.vec_id, c.comp_id,
         |  floor(list_dot_product(
         |          list_transform(range($WideDim), i -> e.v[i + 1] - m.mean[i + 1]),
         |          c.vec) * 1000000) / 1000000.0 AS proj
         |FROM e CROSS JOIN m CROSS JOIN c""".stripMargin,

    // same micro quantization, same integer moments; BIGINT sums promote to
    // HUGEINT where Spark uses DECIMAL(38,0) — exact on both engines, and
    // the score ships as the exact long D div n (D itself crosses 2^53)
    // same hyperplane literals, same floored cosine; rk replays the
    // ref-side thinHotBuckets STRIDE (keep iff bucket under cap OR the
    // portable h32(id·'_annthin') lands on the ceil(size/cap) stride) —
    // NOT a whole-bucket drop: the op keeps a deterministic sample of hot
    // buckets. Never fires at cap=1000 at this scale; the cap=1 _thinned
    // twin below makes it fire and pins the predicate oracle-exact.
    "dedup_cross_emb_pairs" -> crossEmbPairsSql(cap = 1000),

    "dedup_cross_emb_pairs_thinned" -> crossEmbPairsSql(cap = 1),

    // one recomputation checks BOTH the one-pass batch form and the
    // persisted-index incremental form (id-ordered batches ⇒ identical
    // policies, IncrementalDedupSpec pins the engine-side equality)
    "dedup_emb_kept" -> embKeptSql,
    "dedup_incr_emb_kept" -> embKeptSql,

    // the read-only probe's partners are each bucket's 1000 earliest REF
    // members — the stored rank panel, re-derived here as window SQL (no
    // id-order condition: id spaces are independent). Differs from
    // dedup_cross_emb_kept's thinHotBuckets STRIDE only past the bound,
    // which nothing reaches at gate scale — both policies are encoded
    // exactly, not approximated.
    "dedup_incr_emb_probe_kept" ->
      s"""WITH e AS (
         |  SELECT vec_id, embedding::DOUBLE[] AS v,
         |         sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS nrm,
         |         ($bucketExpr)::BIGINT AS bucket
         |  FROM (SELECT vec_id, embedding::DOUBLE[] AS v, embedding FROM embeddings)),
         |pb AS (SELECT * FROM e WHERE vec_id % 2 = 1),
         |rb AS (SELECT * FROM e WHERE vec_id % 2 = 0),
         |rk AS (SELECT bucket, v, nrm FROM (
         |         SELECT rb.*, row_number() OVER (PARTITION BY bucket ORDER BY vec_id) AS rnk
         |         FROM rb) WHERE rnk <= 1000),
         |dropped AS (SELECT DISTINCT p.vec_id
         |            FROM pb p JOIN rk r ON p.bucket = r.bucket
         |            WHERE floor((CASE WHEN p.nrm * r.nrm > 0
         |                   THEN list_dot_product(p.v, r.v) / (p.nrm * r.nrm)
         |                   ELSE 0 END) * 1000000) / 1000000.0 >= 0.3)
         |SELECT vec_id FROM embeddings
         |WHERE vec_id % 2 = 1 AND vec_id NOT IN (SELECT vec_id FROM dropped)""".stripMargin,

    "dedup_cross_emb_kept" ->
      s"""WITH e AS (
         |  SELECT vec_id, embedding::DOUBLE[] AS v,
         |         sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS nrm,
         |         ($bucketExpr)::BIGINT AS bucket
         |  FROM (SELECT vec_id, embedding::DOUBLE[] AS v, embedding FROM embeddings)),
         |pb AS (SELECT * FROM e WHERE vec_id % 2 = 1),
         |rb AS (SELECT * FROM e WHERE vec_id % 2 = 0),
         |${thinStrideCte(cap = 1000)},
         |dropped AS (SELECT DISTINCT p.vec_id
         |            FROM pb p JOIN rk r ON p.bucket = r.bucket
         |            WHERE floor((CASE WHEN p.nrm * r.nrm > 0
         |                   THEN list_dot_product(p.v, r.v) / (p.nrm * r.nrm)
         |                   ELSE 0 END) * 1000000) / 1000000.0 >= 0.3)
         |SELECT vec_id FROM embeddings
         |WHERE vec_id % 2 = 1 AND vec_id NOT IN (SELECT vec_id FROM dropped)""".stripMargin,

    // the green k-means block feeding the green diversity chain, keyed by
    // the learned cluster instead of the label
    "emb_cluster_diversity" ->
      s"""WITH a AS (SELECT vec_id, cluster FROM (${kmeansSql(k = 8, rounds = 2, scale = 1000)}) t),
         |q AS (SELECT a.cluster, list_transform(e.embedding, x -> floor(x::DOUBLE * 1000)::BIGINT) AS qv
         |      FROM a JOIN embeddings e USING (vec_id) WHERE e.embedding IS NOT NULL),
         |ds AS (SELECT cluster, u['d'] AS dim, sum(u['v'])::BIGINT AS s
         |       FROM (SELECT cluster, unnest(list_transform(range(len(qv)),
         |                      i -> {'d': i, 'v': qv[i+1]})) AS u
         |             FROM q)
         |       GROUP BY 1, 2),
         |ssq AS (SELECT cluster, sum(s::HUGEINT * s::HUGEINT) AS ssq FROM ds GROUP BY cluster),
         |rm AS (SELECT cluster, count(*)::BIGINT AS n,
         |              sum(list_sum(list_transform(qv, v -> v * v)))::HUGEINT AS sn2
         |       FROM q GROUP BY cluster)
         |SELECT rm.cluster, rm.n, (rm.n * (rm.n - 1) // 2)::BIGINT AS pairs,
         |  CASE WHEN rm.n > 1
         |       THEN ((rm.n::HUGEINT * rm.sn2 - ssq.ssq) // (rm.n * (rm.n - 1) // 2))::BIGINT
         |  END AS mean_pair_d2
         |FROM rm JOIN ssq USING (cluster)""".stripMargin,

    // identical moment identity over the identical quantized integers;
    // HUGEINT products ↔ the Spark side's DECIMAL(38,0), // ↔ div
    "emb_diversity" ->
      """WITH q AS (SELECT label, list_transform(embedding, x -> floor(x::DOUBLE * 1000)::BIGINT) AS qv
        |           FROM embeddings WHERE embedding IS NOT NULL),
        |ds AS (SELECT label, u['d'] AS dim, sum(u['v'])::BIGINT AS s
        |       FROM (SELECT label, unnest(list_transform(range(len(qv)),
        |                      i -> {'d': i, 'v': qv[i+1]})) AS u
        |             FROM q)
        |       GROUP BY 1, 2),
        |ssq AS (SELECT label, sum(s::HUGEINT * s::HUGEINT) AS ssq FROM ds GROUP BY label),
        |rm AS (SELECT label, count(*)::BIGINT AS n,
        |              sum(list_sum(list_transform(qv, v -> v * v)))::HUGEINT AS sn2
        |       FROM q GROUP BY label)
        |SELECT rm.label, rm.n, (rm.n * (rm.n - 1) // 2)::BIGINT AS pairs,
        |  CASE WHEN rm.n > 1
        |       THEN ((rm.n::HUGEINT * rm.sn2 - ssq.ssq) // (rm.n * (rm.n - 1) // 2))::BIGINT
        |  END AS mean_pair_d2
        |FROM rm JOIN ssq USING (label)""".stripMargin,

    "emb_outliers" ->
      s"""WITH q AS (SELECT vec_id,
         |             list_transform(embedding, x -> floor(x::DOUBLE * 1000)::BIGINT) AS qv
         |           FROM embeddings),
         |mom AS (SELECT u['d'] AS dim, sum(u['v'])::BIGINT AS s, count(*)::BIGINT AS n
         |        FROM (SELECT unnest(list_transform(range(len(qv)),
         |                       i -> {'d': i, 'v': qv[i+1]})) AS u
         |              FROM q)
         |        GROUP BY 1),
         |sv AS (SELECT list(s ORDER BY dim) AS svec, any_value(n) AS n FROM mom),
         |sc AS (SELECT vec_id,
         |              list_sum(list_transform(range($Dim), i ->
         |                (n::HUGEINT * qv[i+1] - svec[i+1]) *
         |                (n::HUGEINT * qv[i+1] - svec[i+1]))) AS d2,
         |              n
         |       FROM q CROSS JOIN sv),
         |tot AS (SELECT sum(d2) AS t FROM sc)
         |SELECT vec_id, (d2 // n)::BIGINT AS d2n,
         |       (d2 * n * 10000 > 10201 * t) AS outlier
         |FROM sc CROSS JOIN tot""".stripMargin,

    // avg of identical doubles; floor-to-micro absorbs summation-order ulps
    "emb_mean_pool" ->
      """SELECT label, u['dim'] AS dim,
        |  floor(avg(u['x']) * 1000000) / 1000000.0 AS mean,
        |  count(*) AS n
        |FROM (SELECT label,
        |        unnest(list_transform(range(len(v)), i -> {'dim': i, 'x': v[i+1]})) AS u
        |      FROM (SELECT label, embedding::DOUBLE[] AS v FROM embeddings))
        |GROUP BY label, u['dim']""".stripMargin,

    // nested-WITH subquery reuses the exact k-means block; same floored
    // cosine guard as dedup_embedding_neardup
    "dedup_semantic_kept" ->
      s"""WITH a AS (SELECT vec_id, cluster FROM (${kmeansSql(k = 8, rounds = 2, scale = 1000)}) t),
         |e AS (SELECT vec_id, embedding::DOUBLE[] AS v,
         |             sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS nrm
         |      FROM embeddings),
         |b AS (SELECT a.vec_id, a.cluster, e.v, e.nrm FROM a JOIN e USING (vec_id)),
         |drp AS (SELECT DISTINCT x.vec_id
         |        FROM b x JOIN b y ON x.cluster = y.cluster AND y.vec_id < x.vec_id
         |        WHERE floor((CASE WHEN x.nrm * y.nrm > 0
         |                          THEN list_dot_product(x.v, y.v) / (x.nrm * y.nrm)
         |                          ELSE 0 END) * 1000000) / 1000000.0 >= 0.4)
         |SELECT vec_id FROM embeddings ANTI JOIN drp USING (vec_id)""".stripMargin,

    // whiten replayed from the persisted model (only live λ > 1e-12
    // components, comp_id order — exactly whitenVector), then the same
    // k-means + lower-id-EXISTS chain as dedup_semantic_kept over the
    // 4-dim whitened vectors. The nested kmeans WITH reads the outer `w`.
    "dedup_semantic_whitened" ->
      s"""WITH w AS (
         |  SELECT e.vec_id,
         |         list(floor(list_dot_product(
         |                list_transform(range($Dim), i -> e.v[i + 1] - m.mean[i + 1]),
         |                c.vec) / sqrt(c.eigenvalue) * 1000000) / 1000000.0
         |              ORDER BY c.comp_id) AS wvec
         |  FROM (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings) e
         |  CROSS JOIN (SELECT mean FROM read_parquet('$PcaFixture/current/mean/*.parquet')) m
         |  CROSS JOIN (SELECT comp_id, eigenvalue, vec
         |              FROM read_parquet('$PcaFixture/current/components/*.parquet')) c
         |  WHERE c.eigenvalue > 1e-12
         |  GROUP BY e.vec_id),
         |a AS (SELECT vec_id, cluster FROM (
         |  ${kmeansSql(k = 8, rounds = 2, scale = 1000, dim = 4, src = "w", vecCol = "wvec")}) t),
         |ew AS (SELECT vec_id, wvec AS v,
         |              sqrt(list_dot_product(wvec, wvec)) AS nrm FROM w),
         |b AS (SELECT a.vec_id, a.cluster, ew.v, ew.nrm FROM a JOIN ew USING (vec_id)),
         |drp AS (SELECT DISTINCT x.vec_id
         |        FROM b x JOIN b y ON x.cluster = y.cluster AND y.vec_id < x.vec_id
         |        WHERE floor((CASE WHEN x.nrm * y.nrm > 0
         |                          THEN list_dot_product(x.v, y.v) / (x.nrm * y.nrm)
         |                          ELSE 0 END) * 1000000) / 1000000.0 >= 0.8)
         |SELECT vec_id FROM w ANTI JOIN drp USING (vec_id)""".stripMargin,

    "ann_topk_cosine" ->
      """WITH n AS (
        |  SELECT vec_id, embedding::DOUBLE[] AS v,
        |         sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS nrm
        |  FROM embeddings),
        |p AS (
        |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
        |         CASE WHEN q.nrm * c.nrm > 0
        |              THEN list_dot_product(q.v, c.v) / (q.nrm * c.nrm)
        |              ELSE 0 END AS cos
        |  FROM n q, n c
        |  WHERE q.vec_id < 10 AND c.vec_id <> q.vec_id),
        |r AS (
        |  SELECT query_id, neighbor_id, cos,
        |         row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rnk
        |  FROM p)
        |SELECT query_id, neighbor_id, rnk, floor(cos * 1000000) / 1000000.0 AS sim
        |FROM r WHERE rnk <= 5""".stripMargin,

    // quantization mirrored expression-by-expression (floor(x+0.5) round,
    // ±127 clamp), then the standard cosine/rank block over integer codes
    "ann_quantized_topk" ->
      """WITH qz AS (
        |  SELECT vec_id,
        |    CASE WHEN maxabs > 0
        |         THEN list_transform(v, x -> greatest(-127, least(127,
        |                floor(x * 127.0 / maxabs + 0.5)::BIGINT)))
        |         ELSE list_transform(v, x -> 0::BIGINT) END AS q
        |  FROM (SELECT vec_id, v, list_max(list_transform(v, x -> abs(x))) AS maxabs
        |        FROM (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings))),
        |n AS (
        |  SELECT vec_id, q::DOUBLE[] AS v,
        |         sqrt(list_dot_product(q::DOUBLE[], q::DOUBLE[])) AS nrm
        |  FROM qz),
        |p AS (
        |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
        |         CASE WHEN q.nrm * c.nrm > 0
        |              THEN list_dot_product(q.v, c.v) / (q.nrm * c.nrm)
        |              ELSE 0 END AS cos
        |  FROM n q, n c
        |  WHERE q.vec_id < 10 AND c.vec_id <> q.vec_id),
        |r AS (
        |  SELECT query_id, neighbor_id, cos,
        |         row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rnk
        |  FROM p)
        |SELECT query_id, neighbor_id, rnk, floor(cos * 1000000) / 1000000.0 AS sim
        |FROM r WHERE rnk <= 5""".stripMargin,

    "ann_lsh_buckets" ->
      s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings)
         |SELECT vec_id, ($bucketExpr)::BIGINT AS bucket
         |FROM e""".stripMargin,

    "dedup_embedding_neardup" ->
      s"""WITH e AS (
         |  SELECT vec_id, embedding::DOUBLE[] AS v,
         |         sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS nrm,
         |         ($bucketExpr)::BIGINT AS bucket
         |  FROM (SELECT vec_id, embedding::DOUBLE[] AS v, embedding FROM embeddings)),
         |p AS (
         |  SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id, a.bucket,
         |         CASE WHEN a.nrm * b.nrm > 0
         |              THEN list_dot_product(a.v, b.v) / (a.nrm * b.nrm)
         |              ELSE 0 END AS cos
         |  FROM e a JOIN e b ON a.bucket = b.bucket AND a.vec_id <> b.vec_id),
         |r AS (
         |  SELECT query_id, neighbor_id, cos,
         |         row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rnk
         |  FROM p)
         |SELECT query_id AS vec_a, neighbor_id AS vec_b,
         |       floor(cos * 1000000) / 1000000.0 AS sim
         |FROM r
         |WHERE rnk <= 50 AND floor(cos * 1000000) / 1000000.0 >= 0.4
         |  AND query_id < neighbor_id""".stripMargin,

    // exact top-3 on the %10 probe sample vs the multiprobe chain (both
    // blocks verbatim from their own green oracles), hit-joined per query
    "ann_recall_audit" -> {
      val masks = (Seq(0L) ++ (0 until Planes).map(p => 1L << p)).mkString("[", ", ", "]")
      s"""WITH e AS (
         |  SELECT vec_id, embedding::DOUBLE[] AS v,
         |         sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS nrm,
         |         ($bucketExpr)::BIGINT AS bucket
         |  FROM (SELECT vec_id, embedding::DOUBLE[] AS v, embedding FROM embeddings)),
         |bp AS (
         |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         |         CASE WHEN q.nrm * c.nrm > 0
         |              THEN list_dot_product(q.v, c.v) / (q.nrm * c.nrm)
         |              ELSE 0 END AS cos
         |  FROM e q, e c
         |  WHERE q.vec_id % 10 = 0 AND c.vec_id <> q.vec_id),
         |ex AS (
         |  SELECT query_id, neighbor_id FROM (
         |    SELECT query_id, neighbor_id,
         |           row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rnk
         |    FROM bp) WHERE rnk <= 3),
         |q AS (
         |  SELECT e.vec_id, e.v, e.nrm, xor(e.bucket, m.m) AS probe
         |  FROM e, (SELECT unnest($masks) AS m) m),
         |mp AS (
         |  SELECT q.vec_id AS query_id, b.vec_id AS neighbor_id,
         |         CASE WHEN q.nrm * b.nrm > 0
         |              THEN list_dot_product(q.v, b.v) / (q.nrm * b.nrm)
         |              ELSE 0 END AS cos
         |  FROM q JOIN e b ON q.probe = b.bucket AND q.vec_id <> b.vec_id),
         |ap AS (
         |  SELECT query_id, neighbor_id FROM (
         |    SELECT query_id, neighbor_id,
         |           row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rnk
         |    FROM mp) WHERE rnk <= 3 AND query_id % 10 = 0)
         |SELECT x.query_id, count(*) AS n_exact,
         |  sum(CASE WHEN a.neighbor_id IS NOT NULL THEN 1 ELSE 0 END)::BIGINT AS n_hit,
         |  floor((sum(CASE WHEN a.neighbor_id IS NOT NULL THEN 1 ELSE 0 END)::DOUBLE
         |         / count(*)::DOUBLE) * 1000000) / 1000000.0 AS recall
         |FROM ex x LEFT JOIN ap a
         |  ON x.query_id = a.query_id AND x.neighbor_id = a.neighbor_id
         |GROUP BY x.query_id""".stripMargin
    },

    "ann_multiprobe_topk" -> {
      val masks = (Seq(0L) ++ (0 until Planes).map(p => 1L << p)).mkString("[", ", ", "]")
      s"""WITH e AS (
         |  SELECT vec_id, embedding::DOUBLE[] AS v,
         |         sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS nrm,
         |         ($bucketExpr)::BIGINT AS bucket
         |  FROM (SELECT vec_id, embedding::DOUBLE[] AS v, embedding FROM embeddings)),
         |q AS (
         |  SELECT e.vec_id, e.v, e.nrm, xor(e.bucket, m.m) AS probe
         |  FROM e, (SELECT unnest($masks) AS m) m),
         |p AS (
         |  SELECT q.vec_id AS query_id, b.vec_id AS neighbor_id,
         |         CASE WHEN q.nrm * b.nrm > 0
         |              THEN list_dot_product(q.v, b.v) / (q.nrm * b.nrm)
         |              ELSE 0 END AS cos
         |  FROM q JOIN e b ON q.probe = b.bucket AND q.vec_id <> b.vec_id),
         |r AS (
         |  SELECT query_id, neighbor_id, cos,
         |         row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rnk
         |  FROM p)
         |SELECT query_id, neighbor_id, rnk, floor(cos * 1000000) / 1000000.0 AS sim
         |FROM r WHERE rnk <= 3""".stripMargin
    },

    // replay of Ivf.search over the persisted index: probe ranking uses the
    // persisted c2 (exact Scala-summed Σc², no re-summation order risk),
    // ties by list_id (Spark's array_sort is stable over the ascending
    // list_id construction order); cosine/top-k identical to the LSH oracles
    "ivf_topk" ->
      s"""WITH a AS (SELECT vec_id, v, list_id
         |           FROM read_parquet('$IvfFixture/current/assignments/*.parquet')),
         |c AS (SELECT list_id, centroid, c2
         |      FROM read_parquet('$IvfFixture/current/centroids/*.parquet')),
         |q AS (SELECT vec_id AS query_id, v AS qv, sqrt(list_dot_product(v, v)) AS qn
         |      FROM a WHERE vec_id % 10 = 0),
         |pr AS (SELECT q.query_id, q.qv, q.qn, c.list_id,
         |              row_number() OVER (PARTITION BY q.query_id
         |                ORDER BY c.c2 - 2.0 * list_dot_product(q.qv, c.centroid),
         |                         c.list_id) AS lr
         |       FROM q, c),
         |p AS (SELECT pr.query_id, a.vec_id AS neighbor_id,
         |             CASE WHEN pr.qn * sqrt(list_dot_product(a.v, a.v)) > 0
         |                  THEN list_dot_product(pr.qv, a.v)
         |                       / (pr.qn * sqrt(list_dot_product(a.v, a.v)))
         |                  ELSE 0 END AS cos
         |      FROM pr JOIN a ON pr.list_id = a.list_id AND pr.query_id <> a.vec_id
         |      WHERE pr.lr <= 2),
         |r AS (SELECT query_id, neighbor_id, cos,
         |             row_number() OVER (PARTITION BY query_id
         |               ORDER BY cos DESC, neighbor_id) AS rnk
         |      FROM p)
         |SELECT query_id, neighbor_id, rnk, floor(cos * 1000000) / 1000000.0 AS sim
         |FROM r WHERE rnk <= 5""".stripMargin,

    "ann_bucket_topk" ->
      s"""WITH e AS (
         |  SELECT vec_id, embedding::DOUBLE[] AS v,
         |         sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS nrm,
         |         ($bucketExpr)::BIGINT AS bucket
         |  FROM (SELECT vec_id, embedding::DOUBLE[] AS v, embedding FROM embeddings)),
         |p AS (
         |  SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id, a.bucket,
         |         CASE WHEN a.nrm * b.nrm > 0
         |              THEN list_dot_product(a.v, b.v) / (a.nrm * b.nrm)
         |              ELSE 0 END AS cos
         |  FROM e a JOIN e b ON a.bucket = b.bucket AND a.vec_id <> b.vec_id),
         |r AS (
         |  SELECT query_id, neighbor_id, bucket, cos,
         |         row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rnk
         |  FROM p)
         |SELECT query_id, neighbor_id, bucket, rnk, floor(cos * 1000000) / 1000000.0 AS sim
         |FROM r WHERE rnk <= 3""".stripMargin,

    // same bucket equi-join with the label-mismatch predicate in the join
    // — a same-label neighbor is never a candidate, rank over what's left
    "ann_hard_negatives" ->
      s"""WITH e AS (
         |  SELECT vec_id, label, v,
         |         sqrt(list_dot_product(v, v)) AS nrm,
         |         ($bucketExpr)::BIGINT AS bucket
         |  FROM (SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings)),
         |p AS (
         |  SELECT a.vec_id AS query_id, a.label, b.vec_id AS neighbor_id,
         |         CASE WHEN a.nrm * b.nrm > 0
         |              THEN list_dot_product(a.v, b.v) / (a.nrm * b.nrm)
         |              ELSE 0 END AS cos
         |  FROM e a JOIN e b ON a.bucket = b.bucket AND a.vec_id <> b.vec_id
         |                    AND a.label <> b.label),
         |r AS (
         |  SELECT query_id, label, neighbor_id, cos,
         |         row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rnk
         |  FROM p)
         |SELECT query_id, label, neighbor_id, rnk,
         |       floor(cos * 1000000) / 1000000.0 AS sim
         |FROM r WHERE rnk <= 3""".stripMargin,

    // the thinning stride mirrored predicate-for-predicate: neighbors in a
    // bucket over the cap survive iff h32(vec_id || '_annthin') lands on the
    // ceil(size/cap) stride — queries stay unthinned, exactly like the Scala
    // side's thinHotBuckets(neighbor side only)
    "ann_bucket_topk_capped" ->
      s"""WITH e AS (
         |  SELECT vec_id, embedding::DOUBLE[] AS v,
         |         sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS nrm,
         |         ($bucketExpr)::BIGINT AS bucket
         |  FROM (SELECT vec_id, embedding::DOUBLE[] AS v, embedding FROM embeddings)),
         |sz AS (SELECT bucket, count(*) AS bsize FROM e GROUP BY bucket),
         |kept AS (
         |  SELECT e.vec_id, e.v, e.nrm, e.bucket
         |  FROM e JOIN sz USING (bucket)
         |  WHERE bsize <= $CapSmall
         |     OR (('0x' || substr(md5(e.vec_id::VARCHAR || '_annthin'), 1, 8))::BIGINT
         |         % ceil(bsize::DOUBLE / $CapSmall)::BIGINT) = 0),
         |p AS (
         |  SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id, a.bucket,
         |         CASE WHEN a.nrm * b.nrm > 0
         |              THEN list_dot_product(a.v, b.v) / (a.nrm * b.nrm)
         |              ELSE 0 END AS cos
         |  FROM e a JOIN kept b ON a.bucket = b.bucket AND a.vec_id <> b.vec_id),
         |r AS (
         |  SELECT query_id, neighbor_id, bucket, cos,
         |         row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rnk
         |  FROM p)
         |SELECT query_id, neighbor_id, bucket, rnk, floor(cos * 1000000) / 1000000.0 AS sim
         |FROM r WHERE rnk <= 3""".stripMargin,

    "ann_multiprobe_topk_capped" -> {
      val masks = (Seq(0L) ++ (0 until Planes).map(p => 1L << p)).mkString("[", ", ", "]")
      s"""WITH e AS (
         |  SELECT vec_id, embedding::DOUBLE[] AS v,
         |         sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS nrm,
         |         ($bucketExpr)::BIGINT AS bucket
         |  FROM (SELECT vec_id, embedding::DOUBLE[] AS v, embedding FROM embeddings)),
         |sz AS (SELECT bucket, count(*) AS bsize FROM e GROUP BY bucket),
         |kept AS (
         |  SELECT e.vec_id, e.v, e.nrm, e.bucket
         |  FROM e JOIN sz USING (bucket)
         |  WHERE bsize <= $CapSmall
         |     OR (('0x' || substr(md5(e.vec_id::VARCHAR || '_annthin'), 1, 8))::BIGINT
         |         % ceil(bsize::DOUBLE / $CapSmall)::BIGINT) = 0),
         |q AS (
         |  SELECT e.vec_id, e.v, e.nrm, xor(e.bucket, m.m) AS probe
         |  FROM e, (SELECT unnest($masks) AS m) m),
         |p AS (
         |  SELECT q.vec_id AS query_id, b.vec_id AS neighbor_id,
         |         CASE WHEN q.nrm * b.nrm > 0
         |              THEN list_dot_product(q.v, b.v) / (q.nrm * b.nrm)
         |              ELSE 0 END AS cos
         |  FROM q JOIN kept b ON q.probe = b.bucket AND q.vec_id <> b.vec_id),
         |r AS (
         |  SELECT query_id, neighbor_id, cos,
         |         row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rnk
         |  FROM p)
         |SELECT query_id, neighbor_id, rnk, floor(cos * 1000000) / 1000000.0 AS sim
         |FROM r WHERE rnk <= 3""".stripMargin
    })
}
