package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, count, floor, least, lit, max, pmod}
import graft.Tables
import graft.ops.Dedup

/** Dedup query surface over `documents` (exact, MinHash+LSH, SimHash,
  * n-gram Jaccard), each with a DuckDB oracle that reproduces the identical
  * md5-based hashes — every signature bit is checkable.
  */
object DedupQueries extends QueryModule {

  private def docs(s: SparkSession, d: String): DataFrame = Tables.documents(s, d)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "dedup_exact_groups" -> ((s, d) => Dedup.exactDupGroups(docs(s, d), "text", "doc_id")),
    "dedup_minhash_sigs" -> ((s, d) => Dedup.minhashSignatures(docs(s, d), "text", "doc_id", k = 8)),
    "dedup_minhash_pairs" -> ((s, d) => Dedup.minhashCandidatePairs(docs(s, d), "text", "doc_id", k = 8, bands = 2)),
    "dedup_simhash" -> ((s, d) => Dedup.simhash16(docs(s, d), "text", "doc_id")),
    "dedup_near_kept" -> ((s, d) =>
      Dedup.dropNearDuplicates(docs(s, d), "text", "doc_id", minJaccard = 0.8)
        .select("doc_id")),
    "dedup_ngram_jaccard" -> ((s, d) => Dedup.ngramJaccardPairs(docs(s, d), "text", "doc_id")),
    // pair-level near-dup feed: LSH candidates + exact Jaccard ≥ 0.5
    // (lower threshold than the drop policy so the row has content to check)
    "dedup_verified_pairs" -> ((s, d) =>
      Dedup.verifiedNearDupPairs(docs(s, d), "text", "doc_id", minJaccard = 0.5)
        .select(col("doc_a"), col("doc_b"),
          graft.ops.Text.floor6(col("jaccard")).as("jaccard"))),
    // dense dup-family detector: the 2-core of the verified-pair graph
    // (pairs/pendants/chains peel away; families with redundancy survive).
    // Fixed 8 peels — idempotent once converged, so the unrolled oracle
    // replays it exactly (the pageRankInt contract)
    "graph_kcore" -> ((s, d) =>
      graft.ops.Graph.kCore(
        Dedup.verifiedNearDupPairs(docs(s, d), "text", "doc_id", minJaccard = 0.5),
        "doc_a", "doc_b", k = 2, rounds = 8)),

    // the threshold-tuning view: candidate-pair Jaccard distribution in
    // 0.1 bands — where to set the drop threshold is read off this
    // histogram; the population is the BANDED candidate set (the set a
    // production run can actually afford), not all pairs
    "dedup_jaccard_hist" -> ((s, d) =>
      Dedup.verifiedNearDupPairs(docs(s, d), "text", "doc_id", minJaccard = 0.05)
        .select(least(floor(col("jaccard") * 10).cast("long"), lit(9L)).as("band"))
        .groupBy("band").agg(count(lit(1)).as("n_pairs"))),

    // transitive clustering of the verified-pair graph (O(log n)
    // large-star/small-star CC — the round-11 default inside Dedup);
    // 0.5 threshold so the graph has chains to close
    "dedup_cc_clusters" -> ((s, d) =>
      Dedup.nearDupClusters(docs(s, d), "text", "doc_id", minJaccard = 0.5)),
    "dedup_cc_kept" -> ((s, d) =>
      Dedup.dropNearDuplicatesCC(docs(s, d), "text", "doc_id", minJaccard = 0.5)
        .select("doc_id")),
    // the O(diameter) min-label-propagation CC over the SAME pair graph —
    // its oracle is literally dedup_cc_clusters', pinning cross-algorithm
    // equivalence through the DuckDB gate (not just the ScalaCheck
    // property). Until round 10 this slot held star CC (as dedup_cc_star)
    // while propagation was the default; round 11 swapped the default, so
    // the twin is now propagation.
    "dedup_cc_prop" -> ((s, d) =>
      graft.ops.Graph.connectedComponents(
        Dedup.verifiedNearDupPairs(docs(s, d), "text", "doc_id", minJaccard = 0.5),
        "doc_a", "doc_b")
        .select(col("id").as("doc_id"), col("comp").as("cluster_id"))),
    "dedup_shingle_dupfrac" -> ((s, d) =>
      Dedup.duplicateShingleFraction(docs(s, d), "text", "doc_id")),
    // exact substring (span-level) dedup — Lee et al. ExactSubstr: cut
    // every ≥20-char span whose content repeats anywhere in the corpus.
    // hashed=false pins the oracle to raw-gram keys (DuckDB cannot
    // reproduce xxhash64); SubstrDedupSpec proves hashed ≡ exact here.
    "dedup_substr_spans" -> ((s, d) =>
      graft.ops.SubstrDedup.dupSpans(docs(s, d), "text", "doc_id",
        k = 20, hashed = false)),
    "dedup_substr_clean" -> ((s, d) =>
      graft.ops.SubstrDedup.removeDupSpans(docs(s, d), "text", "doc_id",
        k = 20, hashed = false)),
    // the 8-byte xxhash64 scale path the 100 TB run would actually use —
    // same spans (SubstrDedupSpec proves hashed ≡ exact on corpora with
    // real collisions-free grams) but the gram shuffle carries fixed-width
    // longs instead of 20-char strings. Oracle = dedup_substr_clean's SQL
    // verbatim (DuckDB cannot reproduce xxhash64, but the OUTPUT is the
    // same clean text, so the raw-gram recomputation checks it fully).
    "dedup_substr_clean_hashed" -> ((s, d) =>
      graft.ops.SubstrDedup.removeDupSpans(docs(s, d), "text", "doc_id",
        k = 20, hashed = true)),
    "dedup_substr_stats" -> ((s, d) =>
      graft.ops.SubstrDedup.dupCharStats(docs(s, d), "text", "doc_id",
        "source", k = 20, hashed = false)),
    // leakage-safe split: near-dup clusters never straddle train/eval
    "split_cluster_safe" -> ((s, d) =>
      Dedup.clusterSafeSplit(docs(s, d), "text", "doc_id",
        trainPct = 90, salt = "split1", minJaccard = 0.5)),
    // cross-corpus dedup: src5-src9 is the "new crawl" (probe), src0-src4
    // the retained training corpus (ref); 0.5 threshold so the pair rows
    // carry checkable content, 0.8 for the drop policy
    "dedup_cross_pairs" -> ((s, d) => {
      val dd = docs(s, d)
      Dedup.crossCorpusPairs(
        dd.filter(col("source") >= "src5"), dd.filter(col("source") < "src5"),
        "text", "doc_id", minJaccard = 0.5)
        .select(col("probe_id"), col("ref_id"),
          graft.ops.Text.floor6(col("jaccard")).as("jaccard"))
    }),
    "dedup_cross_kept" -> ((s, d) => {
      val dd = docs(s, d)
      Dedup.dropCrossCorpusDups(
        dd.filter(col("source") >= "src5"), dd.filter(col("source") < "src5"),
        "text", "doc_id", minJaccard = 0.8)
        .select("doc_id")
    }),
    // INCREMENTAL near-dup maintenance: the corpus arrives as three
    // id-ordered batches; each batch is deduped against the persisted
    // signature index of everything seen so far (ops/IncrementalDedup —
    // the index is never re-signatured), then indexed. With id-ordered
    // batches the kept set provably equals the one-pass batch policy, so
    // the oracle is dedup_near_kept's corpus-wide SQL VERBATIM. The index
    // is wiped per run (the query must be self-contained under
    // Verify/Bench replays); each rep therefore times the FULL three-batch
    // maintenance cycle including the index writes.
    "dedup_incr_kept" -> ((s, d) => {
      val dd = docs(s, d)
      val indexDir = java.nio.file.Paths.get(
        System.getProperty("java.io.tmpdir"), "graft_incrdedup",
        d.replaceAll("[^A-Za-z0-9]", "_")).toString
      val fs = new org.apache.hadoop.fs.Path(indexDir)
        .getFileSystem(s.sparkContext.hadoopConfiguration)
      fs.delete(new org.apache.hadoop.fs.Path(indexDir), true)
      val mRow = dd.agg(max(col("doc_id"))).head // 1-row model read
      if (mRow.isNullAt(0)) dd.select("doc_id") // empty corpus: nothing kept
      else {
      val m = mRow.getLong(0)
      val bounds = Seq(m / 3, 2 * m / 3)
      val batches = Seq(
        dd.filter(col("doc_id") <= bounds(0)),
        dd.filter(col("doc_id") > bounds(0) && col("doc_id") <= bounds(1)),
        dd.filter(col("doc_id") > bounds(1)))
      batches.zipWithIndex.map { case (b, i) =>
        // eagerResult=false (r22): single-shot bench/oracle consumer — the
        // three batches' kept pipelines evaluate together in the harness's
        // one action instead of three checkpoint jobs
        graft.ops.IncrementalDedup.addBatch(s, indexDir, b, "text", "doc_id",
          batchId = i, minJaccard = 0.8, eagerResult = false)
          .select("doc_id")
      }.reduce(_ unionByName _)
      }
    }),
    // the SCALE-layout twin: verification sets stored as 8-byte xxhash64
    // shingle keys (~5× smaller index). An xxhash64 collision can only
    // RAISE a pair's Jaccard — collisions only ever ADD drops (the
    // SubstrDedup hashed discipline) — and at gate scale none occur, so
    // this declares the string form's oracle verbatim; the spec pins
    // kept ⊆ string-form kept structurally.
    "dedup_incr_kept_hashed" -> ((s, d) => {
      val dd = docs(s, d)
      val indexDir = java.nio.file.Paths.get(
        System.getProperty("java.io.tmpdir"), "graft_incrdeduph",
        d.replaceAll("[^A-Za-z0-9]", "_")).toString
      val fs = new org.apache.hadoop.fs.Path(indexDir)
        .getFileSystem(s.sparkContext.hadoopConfiguration)
      fs.delete(new org.apache.hadoop.fs.Path(indexDir), true)
      val mRow = dd.agg(max(col("doc_id"))).head
      if (mRow.isNullAt(0)) dd.select("doc_id")
      else {
        val m = mRow.getLong(0)
        val bounds = Seq(m / 3, 2 * m / 3)
        val batches = Seq(
          dd.filter(col("doc_id") <= bounds(0)),
          dd.filter(col("doc_id") > bounds(0) && col("doc_id") <= bounds(1)),
          dd.filter(col("doc_id") > bounds(1)))
        batches.zipWithIndex.map { case (b, i) =>
          graft.ops.IncrementalDedup.addBatch(s, indexDir, b, "text", "doc_id",
            batchId = i, minJaccard = 0.8, hashedShingles = true,
            eagerResult = false).select("doc_id")
        }.reduce(_ unionByName _)
      }
    }),

    // READ-ONLY index probe (r16): the retained corpus (src0-4) is indexed
    // ONCE via addBatch, then the "new crawl" (src5-9) is filtered with
    // probe() — no write, no batch id consumed, the index untouched. The
    // stored rank panels reproduce dropCrossCorpusDups' ref-bucket
    // representatives exactly (prefix-stable ranks), so the oracle is
    // dedup_cross_kept's SQL verbatim; IncrementalDedupSpec pins the
    // engine-side equality and the no-mutation contract.
    "dedup_incr_probe_kept" -> ((s, d) => {
      val dd = docs(s, d)
      val indexDir = java.nio.file.Paths.get(
        System.getProperty("java.io.tmpdir"), "graft_incrprobe",
        d.replaceAll("[^A-Za-z0-9]", "_")).toString
      val fs = new org.apache.hadoop.fs.Path(indexDir)
        .getFileSystem(s.sparkContext.hadoopConfiguration)
      fs.delete(new org.apache.hadoop.fs.Path(indexDir), true)
      // eagerResult=false (r22): the kept frame of the index-build step is
      // DISCARDED here — lazy mode skips its checkpoint job entirely
      graft.ops.IncrementalDedup.addBatch(s, indexDir,
        dd.filter(col("source") < "src5"), "text", "doc_id", 0,
        eagerResult = false)
      // lazy-result variant (r20): the harness consumes this frame once
      // per run with no concurrent maintenance — the eager default's
      // checkpoint would hide behind this .select and leak one
      // batch-sized RDD per warmup+rep (unreleasable downstream)
      graft.ops.IncrementalDedup.probe(s, indexDir,
        dd.filter(col("source") >= "src5"), "text", "doc_id",
        minJaccard = 0.8, eagerResult = false)
        .select("doc_id")
    }),

    // FUZZY benchmark decontamination: where text_decontaminated_kept drops
    // exact winnow-fingerprint overlap, this drops NEAR-duplicates of the
    // benchmark set (every 50th doc) — the GPT-3/PaLM 13-gram-style fuzzy
    // gate, riding the same banded cross-corpus machinery (probe = corpus,
    // ref = benchmark; never |corpus|×|benchmark|). 0.5 threshold: a doc
    // half-made of benchmark text is contaminated
    "decontam_fuzzy_kept" -> ((s, d) => {
      val dd = docs(s, d)
      Dedup.dropCrossCorpusDups(
        dd.filter(pmod(col("doc_id"), lit(50)) =!= 0),
        dd.filter(pmod(col("doc_id"), lit(50)) === 0),
        "text", "doc_id", minJaccard = 0.5)
        .select("doc_id")
    }),
    // dup-graph analytics over the verified pairs (0.5): node degrees and
    // triangle enumeration (how clique-ish are the dup families?)
    "graph_degrees" -> ((s, d) =>
      graft.ops.Graph.degrees(
        Dedup.verifiedNearDupPairs(docs(s, d), "text", "doc_id", minJaccard = 0.5),
        "doc_a", "doc_b")),
    // hub cap explicitly OFF (Int.MaxValue): the oracle is the unthinned
    // enumeration, and an implicit default cap would silently diverge once
    // a verification corpus grows a 1000-degree node — the _capped twin
    // below proves the guarded path with a stride-mirrored oracle
    "graph_triangles" -> ((s, d) =>
      graft.ops.Graph.triangles(
        Dedup.verifiedNearDupPairs(docs(s, d), "text", "doc_id", minJaccard = 0.5),
        "doc_a", "doc_b", maxDegree = Int.MaxValue)),

    // the guarded path on a deliberately hub-heavy residue graph (~100
    // nodes, degrees well past the tiny cap), so the md5 thinning stride
    // FIRES and the oracle reproduces it predicate-for-predicate — the
    // ann_*_capped / j_fuzzy_blocked_capped contract
    "graph_triangles_capped" -> ((s, d) =>
      graft.ops.Graph.triangles(
        docs(s, d).select((col("doc_id") % 40).as("src"), (col("doc_id") % 97).as("dst")),
        "src", "dst", maxDegree = 8)),

    // integer-exact PageRank over the part→supplier bipartite graph (rank
    // suppliers by weighted part coverage); 5 power iterations, all floors
    "graph_pagerank" -> ((s, d) =>
      graft.ops.Graph.pageRankInt(
        Tables.lineitem(s, d).select(col("l_partkey"),
          // suppliers shifted into a disjoint id space: bipartite sides
          // must not collide in the node id domain
          (col("l_suppkey") + 10000000L).as("supp_node")),
        "l_partkey", "supp_node", iterations = 5)))

  // ---- shared oracle fragments ----

  private val toksCte =
    """SELECT doc_id, list_filter(string_split_regex(lower(text), '\W+'), x -> length(x) > 0) AS toks
      |FROM documents""".stripMargin

  /** Word-3-gram shingles, whole-doc fallback under 3 tokens (mirrors
    * [[graft.ops.Dedup.shingles]]).
    */
  private val shingleCte =
    s"""WITH t AS ($toksCte),
       |sh AS (SELECT doc_id,
       |  CASE WHEN len(toks) >= 3
       |       THEN list_transform(range(len(toks) - 2),
       |                           i -> toks[i+1] || ' ' || toks[i+2] || ' ' || toks[i+3])
       |       ELSE [array_to_string(toks, ' ')] END AS sh
       |FROM t)""".stripMargin

  private def h32sql(e: String): String = s"('0x' || substr(md5($e), 1, 8))::BIGINT"

  /** Shingle-hash bases mirroring [[graft.ops.Dedup]]: one md5 per token,
    * arithmetic 3-gram combine, whole-doc fallback — all 32-bit masked
    * integer math, bit-identical across engines.
    */
  private val basesCte =
    s"""WITH t AS ($toksCte),
       |hsh AS (SELECT doc_id, toks, list_transform(toks, x -> ${h32sql("x")}) AS hs FROM t),
       |b AS (SELECT doc_id,
       |  CASE WHEN len(hs) >= 3
       |       THEN list_transform(range(len(hs) - 2),
       |              i -> ((((hs[i+1] * 1000003 + hs[i+2]) & 4294967295) * 1000003 + hs[i+3]) & 4294967295))
       |       ELSE [${h32sql("array_to_string(toks, ' ')")}] END AS bases
       |FROM hsh)""".stripMargin

  private def sigExpr(seed: Int): String = {
    val (a, bOff) = graft.ops.Dedup.seedConsts(seed)
    s"list_min(list_transform(bases, x -> ((x * $a + $bOff) & 4294967295))) AS sig_$seed"
  }

  private val sigsSql =
    s"""$basesCte
       |SELECT doc_id, ${(0 until 8).map(sigExpr).mkString(",\n  ")}
       |FROM b""".stripMargin

  private def bandKey(b: Int): String =
    "md5(" + (b * 4 until b * 4 + 4).map(i => s"sig_$i::VARCHAR").mkString(" || '_' || ") + ")"

  /** Full candidate→Jaccard chain (mirrors [[graft.ops.Dedup.verifiedNearDupPairs]]
    * before its threshold filter): `jc(doc_a, doc_b, j)` over the capped LSH
    * buckets. Thresholds are applied at the point of use.
    */
  private val jcCte =
    s"""$basesCte,
       |sig AS (SELECT doc_id, ${(0 until 8).map(sigExpr).mkString(",\n  ")} FROM b),
       |bands AS (
       |  SELECT doc_id, 0 AS band, ${bandKey(0)} AS band_key FROM sig
       |  UNION ALL
       |  SELECT doc_id, 1 AS band, ${bandKey(1)} AS band_key FROM sig),
       |ok AS (SELECT band, band_key FROM bands
       |       GROUP BY band, band_key HAVING count(*) BETWEEN 2 AND 1000),
       |cand AS (
       |  SELECT DISTINCT a.doc_id AS doc_a, b2.doc_id AS doc_b
       |  FROM bands a JOIN bands b2
       |    ON a.band = b2.band AND a.band_key = b2.band_key AND a.doc_id < b2.doc_id
       |  JOIN ok ON ok.band = a.band AND ok.band_key = a.band_key),
       |ss AS (SELECT doc_id, list_distinct(
       |  CASE WHEN len(toks) >= 3
       |       THEN list_transform(range(len(toks) - 2),
       |                           i -> toks[i+1] || ' ' || toks[i+2] || ' ' || toks[i+3])
       |       ELSE [array_to_string(toks, ' ')] END) AS shs FROM t),
       |jc AS (
       |  SELECT c.doc_a, c.doc_b,
       |    (CASE WHEN len(list_distinct(list_concat(sa.shs, sb.shs))) > 0
       |          THEN len(list_intersect(sa.shs, sb.shs))::DOUBLE
       |               / len(list_distinct(list_concat(sa.shs, sb.shs)))::DOUBLE
       |          ELSE 0 END) AS j
       |  FROM cand c
       |  JOIN ss sa ON sa.doc_id = c.doc_a
       |  JOIN ss sb ON sb.doc_id = c.doc_b)""".stripMargin

  /** Cross-corpus candidate→Jaccard chain mirroring
    * [[graft.ops.Dedup.crossCorpusPairs]] for an arbitrary probe/ref split
    * of `documents`. Signatures are per-doc, so banding all docs then
    * filtering by the split predicate equals banding each filtered corpus.
    * `rok` mirrors the ref-side maxBucket=1000 cap; thresholds apply at
    * the point of use.
    */
  private def crossCteFor(probePred: String, refPred: String): String =
    s"""$basesCte,
       |sig AS (SELECT doc_id, ${(0 until 8).map(sigExpr).mkString(",\n  ")} FROM b),
       |bands AS (
       |  SELECT doc_id, 0 AS band, ${bandKey(0)} AS band_key FROM sig
       |  UNION ALL
       |  SELECT doc_id, 1 AS band, ${bandKey(1)} AS band_key FROM sig),
       |pb AS (SELECT bands.doc_id, band, band_key
       |       FROM bands JOIN documents USING (doc_id) WHERE $probePred),
       |rb AS (SELECT bands.doc_id, band, band_key
       |       FROM bands JOIN documents USING (doc_id) WHERE $refPred),
       |rok AS (SELECT band, band_key FROM rb
       |        GROUP BY band, band_key HAVING count(*) <= 1000),
       |xcand AS (
       |  SELECT DISTINCT p.doc_id AS probe_id, r.doc_id AS ref_id
       |  FROM pb p JOIN rb r ON p.band = r.band AND p.band_key = r.band_key
       |  JOIN rok ON rok.band = p.band AND rok.band_key = p.band_key),
       |ss AS (SELECT doc_id, list_distinct(
       |  CASE WHEN len(toks) >= 3
       |       THEN list_transform(range(len(toks) - 2),
       |                           i -> toks[i+1] || ' ' || toks[i+2] || ' ' || toks[i+3])
       |       ELSE [array_to_string(toks, ' ')] END) AS shs FROM t),
       |xj AS (
       |  SELECT c.probe_id, c.ref_id,
       |    (CASE WHEN len(list_distinct(list_concat(sa.shs, sb.shs))) > 0
       |          THEN len(list_intersect(sa.shs, sb.shs))::DOUBLE
       |               / len(list_distinct(list_concat(sa.shs, sb.shs)))::DOUBLE
       |          ELSE 0 END) AS j
       |  FROM xcand c
       |  JOIN ss sa ON sa.doc_id = c.probe_id
       |  JOIN ss sb ON sb.doc_id = c.ref_id)""".stripMargin

  /** The round-spanning split: probe = src5-src9, ref = src0-src4. */
  private val crossCte = crossCteFor("source >= 'src5'", "source < 'src5'")

  /** The KEPT-SET variant of [[crossCteFor]]: candidates come from each
    * ref bucket's 1000 lowest-id RANK REPRESENTATIVES instead of the
    * pair surface's whole-bucket skip — vacuous at every oracle scale
    * (no ref bucket exceeds 1000 members), load-bearing at 100× where
    * mass-duplicated ref content must still drop its probe copies.
    */
  private def crossKeptCteFor(probePred: String, refPred: String): String =
    s"""$basesCte,
       |sig AS (SELECT doc_id, ${(0 until 8).map(sigExpr).mkString(",\n  ")} FROM b),
       |bands AS (
       |  SELECT doc_id, 0 AS band, ${bandKey(0)} AS band_key FROM sig
       |  UNION ALL
       |  SELECT doc_id, 1 AS band, ${bandKey(1)} AS band_key FROM sig),
       |pb AS (SELECT bands.doc_id, band, band_key
       |       FROM bands JOIN documents USING (doc_id) WHERE $probePred),
       |rb AS (SELECT bands.doc_id, band, band_key
       |       FROM bands JOIN documents USING (doc_id) WHERE $refPred),
       |rr AS (SELECT doc_id, band, band_key,
       |         row_number() OVER (PARTITION BY band, band_key ORDER BY doc_id) AS rk
       |       FROM rb),
       |xcand AS (
       |  SELECT DISTINCT p.doc_id AS probe_id, r.doc_id AS ref_id
       |  FROM pb p JOIN rr r ON p.band = r.band AND p.band_key = r.band_key
       |  WHERE r.rk <= 1000),
       |ss AS (SELECT doc_id, list_distinct(
       |  CASE WHEN len(toks) >= 3
       |       THEN list_transform(range(len(toks) - 2),
       |                           i -> toks[i+1] || ' ' || toks[i+2] || ' ' || toks[i+3])
       |       ELSE [array_to_string(toks, ' ')] END) AS shs FROM t),
       |xj AS (
       |  SELECT c.probe_id, c.ref_id,
       |    (CASE WHEN len(list_distinct(list_concat(sa.shs, sb.shs))) > 0
       |          THEN len(list_intersect(sa.shs, sb.shs))::DOUBLE
       |               / len(list_distinct(list_concat(sa.shs, sb.shs)))::DOUBLE
       |          ELSE 0 END) AS j
       |  FROM xcand c
       |  JOIN ss sa ON sa.doc_id = c.probe_id
       |  JOIN ss sb ON sb.doc_id = c.ref_id)""".stripMargin

  /** Transitive closure over the verified pairs at threshold 0.5: recursive
    * reachability (`reach(nid, lbl)` = lbl reachable from nid), so
    * min(lbl) per nid is exactly the connected-component min-id label the
    * Spark-side propagation converges to.
    */
  private val reachCte =
    s"""WITH RECURSIVE ${jcCte.stripPrefix("WITH ")},
       |pr AS (SELECT doc_a, doc_b FROM jc WHERE j >= 0.5),
       |edges AS (SELECT doc_a AS ea, doc_b AS eb FROM pr
       |          UNION SELECT doc_b, doc_a FROM pr),
       |reach AS (
       |  SELECT DISTINCT ea AS nid, ea AS lbl FROM edges
       |  UNION
       |  SELECT r.nid, e.eb FROM reach r JOIN edges e ON e.ea = r.lbl)""".stripMargin

  /** Shared ExactSubstr CTE (k = 20, 1-based positions): every 20-char
    * window → corpus-duplicated grams → marked positions → maximal merged
    * spans via gaps-and-islands, a direct transliteration of
    * [[graft.ops.SubstrDedup.dupSpans]] with raw-gram keys.
    */
  private val substrSpansCte =
    """WITH w_ss AS (
      |  SELECT doc_id, substr(text, pos, 20) AS gram, pos FROM (
      |    SELECT doc_id, text, unnest(generate_series(1, length(text) - 19)) AS pos
      |    FROM documents WHERE length(text) >= 20)),
      |dup_ss AS (SELECT gram FROM w_ss GROUP BY gram HAVING count(*) >= 2),
      |m_ss AS (SELECT w_ss.doc_id, w_ss.pos FROM w_ss JOIN dup_ss USING (gram)),
      |i1_ss AS (SELECT doc_id, pos,
      |    CASE WHEN pos > coalesce(max(pos + 19) OVER (PARTITION BY doc_id
      |        ORDER BY pos ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
      |      -9223372036854775807) + 1 THEN 1 ELSE 0 END AS st
      |  FROM m_ss),
      |i2_ss AS (SELECT doc_id, pos,
      |    sum(st) OVER (PARTITION BY doc_id ORDER BY pos ROWS UNBOUNDED PRECEDING) AS isl
      |  FROM i1_ss),
      |spans_ss AS (SELECT doc_id, min(pos)::BIGINT AS span_start,
      |    (max(pos) + 19)::BIGINT AS span_end
      |  FROM i2_ss GROUP BY doc_id, isl)""".stripMargin

  /** The one-pass drop policy's kept set, corpus-wide — shared verbatim by
    * `dedup_near_kept` (the batch form) and `dedup_incr_kept` /
    * `dedup_incr_kept_hashed` (the persisted-index incremental forms):
    * under id-ordered batches the engines' policies coincide
    * pair-for-pair, so one independent DuckDB recomputation checks all.
    * Candidates are RANK-REPRESENTATIVE pairs (doc_a among its bucket's
    * 1000 earliest members) — vacuous wherever buckets hold ≤ 1000
    * members, i.e. at every oracle scale, where this is exactly the old
    * any-lower-id bucket-mate rule; at 100× it is what lets
    * mass-duplicated content dedup instead of being skip-capped.
    */
  private lazy val nearKeptSql =
    s"""$basesCte,
       |sig AS (SELECT doc_id, ${(0 until 8).map(sigExpr).mkString(",\n  ")} FROM b),
       |bands AS (
       |  SELECT doc_id, 0 AS band, ${bandKey(0)} AS band_key FROM sig
       |  UNION ALL
       |  SELECT doc_id, 1 AS band, ${bandKey(1)} AS band_key FROM sig),
       |rb AS (SELECT doc_id, band, band_key,
       |         row_number() OVER (PARTITION BY band, band_key ORDER BY doc_id) AS rk
       |       FROM bands),
       |cand AS (
       |  SELECT DISTINCT a.doc_id AS doc_a, b2.doc_id AS doc_b
       |  FROM rb a JOIN bands b2
       |    ON a.band = b2.band AND a.band_key = b2.band_key AND a.doc_id < b2.doc_id
       |  WHERE a.rk <= 1000),
       |ss AS (SELECT doc_id, list_distinct(
       |  CASE WHEN len(toks) >= 3
       |       THEN list_transform(range(len(toks) - 2),
       |                           i -> toks[i+1] || ' ' || toks[i+2] || ' ' || toks[i+3])
       |       ELSE [array_to_string(toks, ' ')] END) AS shs FROM t),
       |dropped AS (
       |  SELECT DISTINCT c.doc_b FROM cand c
       |  JOIN ss sa ON sa.doc_id = c.doc_a
       |  JOIN ss sb ON sb.doc_id = c.doc_b
       |  WHERE (CASE WHEN len(list_distinct(list_concat(sa.shs, sb.shs))) > 0
       |              THEN len(list_intersect(sa.shs, sb.shs))::DOUBLE
       |                   / len(list_distinct(list_concat(sa.shs, sb.shs)))::DOUBLE
       |              ELSE 0 END) >= 0.8)
       |SELECT doc_id FROM documents
       |WHERE doc_id NOT IN (SELECT doc_b FROM dropped)""".stripMargin

  val oracle: Map[String, String] = Map(
    "dedup_substr_spans" ->
      s"""$substrSpansCte
         |SELECT doc_id, span_start, span_end FROM spans_ss""".stripMargin,

    "dedup_substr_clean" ->
      s"""$substrSpansCte,
         |gaps_ss AS (
         |  SELECT doc_id,
         |    coalesce(lag(span_end) OVER (PARTITION BY doc_id ORDER BY span_start), 0) + 1 AS gs,
         |    span_start - 1 AS ge
         |  FROM spans_ss
         |  UNION ALL
         |  SELECT doc_id, max(span_end) + 1 AS gs, NULL AS ge
         |  FROM spans_ss GROUP BY doc_id),
         |segs_ss AS (
         |  SELECT g.doc_id, gs,
         |    substr(d.text, gs::INT, (coalesce(ge, length(d.text)) - gs + 1)::INT) AS seg
         |  FROM gaps_ss g JOIN documents d USING (doc_id)),
         |agg_ss AS (SELECT doc_id, string_agg(seg, '' ORDER BY gs) AS clean_text
         |  FROM segs_ss GROUP BY doc_id)
         |SELECT d.doc_id, coalesce(a.clean_text, d.text) AS clean_text
         |FROM documents d LEFT JOIN agg_ss a USING (doc_id)""".stripMargin,

    // the hashed twin declares the raw-gram oracle VERBATIM: DuckDB cannot
    // reproduce xxhash64, but SubstrDedupSpec proves hashed ≡ exact spans
    // (identical clean text), so the full rows+schema+hash check applies —
    // the board still pays the 8-byte-gram shuffle the scale path pays.
    "dedup_substr_clean_hashed" ->
      s"""$substrSpansCte,
         |gaps_ss AS (
         |  SELECT doc_id,
         |    coalesce(lag(span_end) OVER (PARTITION BY doc_id ORDER BY span_start), 0) + 1 AS gs,
         |    span_start - 1 AS ge
         |  FROM spans_ss
         |  UNION ALL
         |  SELECT doc_id, max(span_end) + 1 AS gs, NULL AS ge
         |  FROM spans_ss GROUP BY doc_id),
         |segs_ss AS (
         |  SELECT g.doc_id, gs,
         |    substr(d.text, gs::INT, (coalesce(ge, length(d.text)) - gs + 1)::INT) AS seg
         |  FROM gaps_ss g JOIN documents d USING (doc_id)),
         |agg_ss AS (SELECT doc_id, string_agg(seg, '' ORDER BY gs) AS clean_text
         |  FROM segs_ss GROUP BY doc_id)
         |SELECT d.doc_id, coalesce(a.clean_text, d.text) AS clean_text
         |FROM documents d LEFT JOIN agg_ss a USING (doc_id)""".stripMargin,

    "dedup_substr_stats" ->
      s"""$substrSpansCte,
         |perdoc_ss AS (SELECT doc_id,
         |    sum(span_end - span_start + 1)::BIGINT AS doc_dup
         |  FROM spans_ss GROUP BY doc_id),
         |j_ss AS (SELECT d.source, length(d.text)::BIGINT AS n,
         |    coalesce(p.doc_dup, 0)::BIGINT AS doc_dup
         |  FROM documents d LEFT JOIN perdoc_ss p USING (doc_id)),
         |a_ss AS (SELECT source, sum(n)::BIGINT AS total_chars,
         |    sum(doc_dup)::BIGINT AS dup_chars
         |  FROM j_ss GROUP BY source)
         |SELECT source, total_chars, dup_chars,
         |  floor((dup_chars::DOUBLE / total_chars::DOUBLE) * 1000000) / 1000000.0
         |    AS dup_frac
         |FROM a_ss""".stripMargin,

    "dedup_exact_groups" ->
      """SELECT md5(regexp_replace(lower(text), '\s+', ' ', 'g')) AS fp_md5,
        |  min(doc_id) AS keeper_id, count(*) AS n_docs
        |FROM documents GROUP BY 1""".stripMargin,

    "dedup_minhash_sigs" -> sigsSql,

    // `ok` mirrors the Spark-side maxBucket=1000 hot-bucket cap
    "dedup_minhash_pairs" ->
      s"""$basesCte,
         |sig AS (SELECT doc_id, ${(0 until 8).map(sigExpr).mkString(",\n  ")} FROM b),
         |bands AS (
         |  SELECT doc_id, 0 AS band, ${bandKey(0)} AS band_key FROM sig
         |  UNION ALL
         |  SELECT doc_id, 1 AS band, ${bandKey(1)} AS band_key FROM sig),
         |ok AS (SELECT band, band_key FROM bands
         |       GROUP BY band, band_key HAVING count(*) BETWEEN 2 AND 1000)
         |SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
         |FROM bands a JOIN bands b
         |  ON a.band = b.band AND a.band_key = b.band_key AND a.doc_id < b.doc_id
         |JOIN ok ON ok.band = a.band AND ok.band_key = a.band_key""".stripMargin,

    "dedup_near_kept" -> nearKeptSql,

    // incremental maintenance ≡ the one-pass batch policy under id-ordered
    // batches (every (a,b) a<b pair examined exactly once: in b's batch,
    // with a indexed or intra-batch) — so the corpus-wide SQL applies
    // verbatim; IncrementalDedupSpec pins the engine-side equality too
    "dedup_incr_kept" -> nearKeptSql,
    "dedup_incr_kept_hashed" -> nearKeptSql,

    "dedup_verified_pairs" ->
      s"""$jcCte
         |SELECT doc_a, doc_b, floor(j * 1000000) / 1000000.0 AS jaccard
         |FROM jc WHERE j >= 0.5""".stripMargin,

    "dedup_cross_pairs" ->
      s"""$crossCte
         |SELECT probe_id, ref_id, floor(j * 1000000) / 1000000.0 AS jaccard
         |FROM xj WHERE j >= 0.5""".stripMargin,

    "dedup_cross_kept" ->
      s"""${crossKeptCteFor("source >= 'src5'", "source < 'src5'")},
         |xdropped AS (SELECT DISTINCT probe_id FROM xj WHERE j >= 0.8)
         |SELECT doc_id FROM documents
         |WHERE source >= 'src5'
         |  AND doc_id NOT IN (SELECT probe_id FROM xdropped)""".stripMargin,

    // the read-only index probe reproduces the batch cross-corpus policy
    // exactly (stored rank panels ≡ the array_sort representatives), so
    // one recomputation checks both forms
    "dedup_incr_probe_kept" ->
      s"""${crossKeptCteFor("source >= 'src5'", "source < 'src5'")},
         |xdropped AS (SELECT DISTINCT probe_id FROM xj WHERE j >= 0.8)
         |SELECT doc_id FROM documents
         |WHERE source >= 'src5'
         |  AND doc_id NOT IN (SELECT probe_id FROM xdropped)""".stripMargin,

    "decontam_fuzzy_kept" ->
      s"""${crossKeptCteFor("doc_id % 50 <> 0", "doc_id % 50 = 0")},
         |xdropped AS (SELECT DISTINCT probe_id FROM xj WHERE j >= 0.5)
         |SELECT doc_id FROM documents
         |WHERE doc_id % 50 <> 0
         |  AND doc_id NOT IN (SELECT probe_id FROM xdropped)""".stripMargin,

    // 8 unrolled peel rounds over the symmetrized distinct edge list —
    // UNION (distinct) ↔ Spark's distinct, HAVING ↔ the degree filter.
    // Every e_r/k_r is MATERIALIZED: DuckDB inlines plain CTEs, and each
    // round references its predecessor 3× — un-materialized, the parquet
    // subtree would duplicate 3^8 times and exhaust file handles
    "graph_kcore" -> {
      val peels = (1 to 8).map { r =>
        s"""k$r AS MATERIALIZED (SELECT src AS id FROM e${r - 1} GROUP BY src HAVING count(*) >= 2),
           |e$r AS MATERIALIZED (SELECT e.src, e.dst FROM e${r - 1} e
           |        JOIN k$r a ON a.id = e.src JOIN k$r b ON b.id = e.dst)""".stripMargin
      }.mkString(",\n")
      s"""$jcCte,
         |pr AS (SELECT doc_a, doc_b FROM jc WHERE j >= 0.5),
         |e0 AS MATERIALIZED (
         |       SELECT doc_a AS src, doc_b AS dst FROM pr WHERE doc_a <> doc_b
         |       UNION SELECT doc_b, doc_a FROM pr WHERE doc_a <> doc_b),
         |$peels
         |SELECT src AS id, count(*)::BIGINT AS degree
         |FROM e8 GROUP BY src HAVING count(*) >= 2""".stripMargin
    },

    // single-division doubles: both engines compute the identical IEEE
    // quotient of the same small ints, so the band floor cannot straddle
    "dedup_jaccard_hist" ->
      s"""$jcCte
         |SELECT least(floor(j * 10)::BIGINT, 9) AS band, count(*)::BIGINT AS n_pairs
         |FROM jc WHERE j >= 0.05 GROUP BY band""".stripMargin,

    "dedup_cc_clusters" ->
      s"""$reachCte
         |SELECT nid AS doc_id, min(lbl)::BIGINT AS cluster_id
         |FROM reach GROUP BY nid""".stripMargin,

    "dedup_cc_prop" ->
      s"""$reachCte
         |SELECT nid AS doc_id, min(lbl)::BIGINT AS cluster_id
         |FROM reach GROUP BY nid""".stripMargin,

    "dedup_cc_kept" ->
      s"""$reachCte,
         |dropped AS (SELECT nid FROM reach GROUP BY nid HAVING min(lbl) <> nid)
         |SELECT doc_id FROM documents
         |WHERE doc_id NOT IN (SELECT nid FROM dropped)""".stripMargin,

    "split_cluster_safe" ->
      s"""$reachCte,
         |cl AS (SELECT nid AS doc_id, min(lbl)::BIGINT AS cluster_id
         |       FROM reach GROUP BY nid),
         |wc AS (SELECT d.doc_id, coalesce(cl.cluster_id, d.doc_id) AS cluster_id
         |       FROM documents d LEFT JOIN cl ON cl.doc_id = d.doc_id)
         |SELECT doc_id, cluster_id,
         |  CASE WHEN ${h32sql("cluster_id::VARCHAR || '_split1'")} % 100 < 90
         |       THEN 'train' ELSE 'eval' END AS split
         |FROM wc""".stripMargin,

    "graph_degrees" ->
      s"""$jcCte,
         |pr AS (SELECT doc_a, doc_b FROM jc WHERE j >= 0.5),
         |sym AS (SELECT doc_a AS id, doc_b AS nb FROM pr
         |        UNION SELECT doc_b, doc_a FROM pr)
         |SELECT id, count(*) AS degree FROM sym GROUP BY id""".stripMargin,

    "graph_triangles" ->
      s"""$jcCte,
         |pr AS (SELECT least(doc_a, doc_b) AS lo, greatest(doc_a, doc_b) AS hi
         |       FROM jc WHERE j >= 0.5)
         |SELECT ab.lo AS a, ab.hi AS b, bc.hi AS c
         |FROM pr ab
         |JOIN pr bc ON bc.lo = ab.hi
         |JOIN pr ac ON ac.lo = ab.lo AND ac.hi = bc.hi""".stripMargin,

    // hub-cap stride mirrored predicate-for-predicate: an edge incident to
    // an over-cap node survives iff the OTHER endpoint's
    // h32(other || '_trithin') lands on the ceil(deg/cap) stride — exactly
    // Graph.triangles' thinning, then the same two-join enumeration
    "graph_triangles_capped" ->
      """WITH e AS (SELECT DISTINCT least(doc_id % 40, doc_id % 97) AS lo,
        |                  greatest(doc_id % 40, doc_id % 97) AS hi
        |           FROM documents WHERE doc_id % 40 <> doc_id % 97),
        |deg AS (SELECT node, count(*) AS d
        |        FROM (SELECT lo AS node FROM e UNION ALL SELECT hi FROM e)
        |        GROUP BY node),
        |hot AS (SELECT node, d FROM deg WHERE d > 8),
        |kept AS (
        |  SELECT e.lo, e.hi
        |  FROM e
        |  LEFT JOIN hot dl ON dl.node = e.lo
        |  LEFT JOIN hot dh ON dh.node = e.hi
        |  WHERE (dl.node IS NULL OR
        |         (('0x' || substr(md5(e.hi::VARCHAR || '_trithin'), 1, 8))::BIGINT
        |          % ceil(dl.d::DOUBLE / 8)::BIGINT) = 0)
        |    AND (dh.node IS NULL OR
        |         (('0x' || substr(md5(e.lo::VARCHAR || '_trithin'), 1, 8))::BIGINT
        |          % ceil(dh.d::DOUBLE / 8)::BIGINT) = 0))
        |SELECT ab.lo AS a, ab.hi AS b, bc.hi AS c
        |FROM kept ab
        |JOIN kept bc ON bc.lo = ab.hi
        |JOIN kept ac ON ac.lo = ab.lo AND ac.hi = bc.hi""".stripMargin,

    // unrolled power iterations; // is DuckDB integer division = Spark div
    "graph_pagerank" -> {
      val iters = (1 to 5).map { i =>
        s"""c$i AS (SELECT e.dst AS node, sum(r${i - 1}.r // od.deg)::BIGINT AS s
           |  FROM e JOIN r${i - 1} ON r${i - 1}.node = e.src
           |  JOIN od ON od.src = e.src GROUP BY e.dst),
           |r$i AS (SELECT n.node,
           |    (150000 + (850000 * coalesce(c$i.s, 0)) // 1000000)::BIGINT AS r
           |  FROM nodes n LEFT JOIN c$i USING (node))""".stripMargin
      }.mkString(",\n")
      s"""WITH e AS (SELECT DISTINCT l_partkey::BIGINT AS src,
         |                  (l_suppkey + 10000000)::BIGINT AS dst
         |           FROM lineitem),
         |nodes AS (SELECT src AS node FROM e UNION SELECT dst FROM e),
         |od AS (SELECT src, count(*)::BIGINT AS deg FROM e GROUP BY src),
         |r0 AS (SELECT node, 1000000::BIGINT AS r FROM nodes),
         |$iters
         |SELECT node, r AS rank_micro FROM r5""".stripMargin
    },

    "dedup_shingle_dupfrac" ->
      s"""$basesCte,
         |db AS (SELECT DISTINCT doc_id, base
         |       FROM (SELECT doc_id, unnest(bases) AS base FROM b)),
         |ph AS (SELECT base, count(*)::BIGINT AS n_docs FROM db GROUP BY base),
         |ag AS (SELECT db.doc_id, count(*)::BIGINT AS n_shingles,
         |         sum(CASE WHEN ph.n_docs > 1 THEN 1 ELSE 0 END)::BIGINT AS n_shared
         |       FROM db JOIN ph USING (base) GROUP BY db.doc_id)
         |SELECT doc_id, n_shingles, n_shared,
         |  floor((n_shared::DOUBLE / n_shingles::DOUBLE) * 1000000) / 1000000.0
         |    AS dup_fraction
         |FROM ag""".stripMargin,

    "dedup_simhash" -> {
      val bitVotes = (0 until 16).map { b =>
        s"(CASE WHEN coalesce(list_sum(list_transform(hs, h -> CASE WHEN ((h >> $b) & 1) = 1 THEN 1 ELSE -1 END)), 0) > 0 THEN ${1L << b} ELSE 0 END)"
      }.mkString(" +\n    ")
      s"""WITH t AS ($toksCte),
         |h AS (SELECT doc_id, list_transform(toks, x -> ${h32sql("x")}) AS hs FROM t)
         |SELECT doc_id, ($bitVotes)::BIGINT AS simhash
         |FROM h""".stripMargin
    },

    "dedup_ngram_jaccard" ->
      s"""$shingleCte,
         |ds AS (SELECT doc_id, list_distinct(sh) AS shs FROM sh)
         |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         |  floor((CASE WHEN len(list_distinct(list_concat(a.shs, b.shs))) > 0
         |              THEN len(list_intersect(a.shs, b.shs))::DOUBLE
         |                   / len(list_distinct(list_concat(a.shs, b.shs)))::DOUBLE
         |              ELSE 0 END) * 1000000) / 1000000.0 AS jaccard
         |FROM ds a JOIN ds b ON b.doc_id = a.doc_id + 1""".stripMargin)
}
