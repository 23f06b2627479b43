package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every implemented operator from SURVEY.md §2 has an entry in `queries`
  * (name → (spark, sfDir) => DataFrame) and, where ANSI-SQL-expressible, a
  * DuckDB oracle in `oracleSql` with IDENTICAL output column names.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Word count is the reference's flagship topology
    * (reference `KafkaWordCount.java:56-67`).
    */
  def entry(spark: SparkSession): DataFrame =
    ops.Text.wordCount(Tables.documents(spark, "/root/testdata/sf0.001"), "text")

  private val modules: Seq[QueryModule] = Seq(
    TextQueries, RelationalQueries, JoinQueries, WindowQueries,
    DedupQueries, SimilarityQueries, ExtrasQueries)

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    modules.map(_.queries).reduce(_ ++ _)

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] = modules.map(_.oracle).reduce(_ ++ _)

  /** Headline subset benchmarked per-round at sf0.1 (Bench.scala) — one
    * per operator family so a regression anywhere shows in the round delta.
    */
  def benchQueries: Seq[String] = Seq(
    "q1_pricing_summary", "q3_top_orders", "q5_local_supplier",
    "q6_forecast_revenue", "text_wordcount", "text_quality_score",
    "j5_multiway_revenue", "j1_window_inner_join", "w1_tumbling_agg",
    "dedup_minhash_pairs", "ann_topk_cosine",
    "j3_window_outer_join", "w3_session_agg", "dedup_near_kept",
    "text_cleanse", "sample_stratified",
    "q14_promo_revenue", "text_repetition", "text_contamination",
    "ann_multiprobe_topk",
    // round-4 additions (kept AFTER the stable 20 so cross-round common-set
    // comparisons stay clean): retrieval, boilerplate, packing, quantized
    // ANN, as-of join, temperature mix
    "text_bm25", "text_boilerplate", "seq_pack_concat",
    "ann_quantized_topk", "j_asof", "sample_temperature",
    // round-6 additions: transitive CC dedup (iterative propagation),
    // dup-shingle fraction, corpus-unigram LM scoring
    "dedup_cc_kept", "dedup_shingle_dupfrac", "text_unigram_logprob",
    "emb_kmeans_assign", "text_zipf_rank", "ts_resample_fill", "text_chunks",
    // round-6 additions: bucketed range join, skew-salted join, SCD2
    // changelog materialization, Misra-Gries heavy hitters
    "j_range_bucketed", "skew_salted_join", "cdc_scd2", "freq_heavy_hitters",
    // round-6 batch 2: BPE bigrams, SemDeDup, bloom-pruned join, Q7,
    // posting stats, z-order keys
    "text_bigram_top", "dedup_semantic_kept", "j_bloom_prune",
    "q7_volume_shipping", "text_postings", "layout_zorder",
    "cdc_snapshot_diff", "sample_oversample", "link_golden_record",
    "graph_pagerank", "j_fuzzy_blocked", "sample_epoch_shuffle",
    "q21_waiting_supplier",
    // round-7 additions: guarded (thinned) bucketed ANN, the cross-pinned
    // CC twin (propagation since round 11 — star became the Dedup default,
    // was dedup_cc_star), the deepest TPC-H join (Q8), bigram LM scoring,
    // and histogram-threshold top-fraction selection
    "ann_bucket_topk_capped", "dedup_cc_prop", "q8_market_share",
    "text_bigram_logprob", "sample_top_frac", "emb_pca_project",
    // round-8 additions: whiten→cluster→dedup composition and the
    // degree-capped triangle enumeration (guarded-path twin)
    "dedup_semantic_whitened", "graph_triangles_capped",
    // round-10 addition: exact substring (span-level) dedup. The declared
    // query pins hashed=false (oracle-checkable raw-gram keys), so the
    // bench number is the conservative upper bound — the 8-byte xxhash64
    // scale path (proven span-identical in SubstrDedupSpec) only shrinks
    // the shuffle
    "dedup_substr_clean",
    // round-11: the hashed (8-byte gram key) scale-path twin on the board —
    // SubstrDedupSpec pins hashed ≡ exact; this is the shuffle 100 TB pays
    "dedup_substr_clean_hashed",
    // round-10 addition: hybrid lexical ⊕ semantic retrieval (per-query
    // BM25 + cosine ANN fused by reciprocal rank)
    "search_hybrid_rrf",
    // round-10 addition: distributed training + scoring of the hashed-BoW
    // quality classifier (2 GD rounds end-to-end)
    "clf_quality_score",
    // round-10 addition: waterfilling token-budget mixture (sorted-prefix
    // waterline solve + broadcast-rate admission)
    "mix_waterfill_kept",
    // round-10 additions: cohort-retention matrix (one user-keyed set-agg
    // shuffle), integer-exact rolling z-score anomalies (key-partitioned
    // window), centroid-distance embedding outliers (d-bounded moments +
    // 1-row broadcast)
    "ts_cohort_retention", "ts_anomaly", "emb_outliers",
    // round-10 addition: closed-form two-sided CUSUM changepoint detection
    "ts_cusum",
    // round-10 additions: cross-corpus dedup (new crawl vs retained
    // training set — banded equi-join, never |probe|×|ref|) and the
    // Hilbert layout key (staged per-level fold, narrow + codegen'd)
    "dedup_cross_kept", "layout_hilbert",
    // round-10 batch 2: fuzzy benchmark decontamination (banded
    // cross-corpus gate), exact per-class embedding diversity (one
    // moment pass, no pairs), exact chi-square snapshot drift
    "decontam_fuzzy_kept", "emb_diversity", "drift_chi2",
    // round-10 batch 3: corpus-vocab OOV audit (TakeOrdered vocab model +
    // broadcast membership) and the DoReMi-lite mixture optimizer
    "text_oov_rate", "mix_domain_weights",
    // round-11: q21_waiting_supplier above IS now the Expand-free grouped
    // pass (min/max predicates replace countDistinct); the structural
    // semi+anti form stays oracle-gated as q21_waiting_supplier_structural
    // but is off the board (6.1 s vs 1.2 s at sf0.1 — it is the plan the
    // 100 TB path must not run)
    // round-10 batch 4: cross-corpus embedding dedup (bucket equi-join +
    // floored-cosine verify, the vector twin of dedup_cross_kept)
    "dedup_cross_emb_kept",
    // round-10 batch 5: quota-exact stratified split (two-level rank),
    // export shard manifest (one map-combined pass), and the curation
    // gates through the textual CSAS surface
    "split_stratified", "export_shard_manifest", "p14_curation_csas",
    // round-12: image near-dup via banded Hamming join over the 63-bit
    // dHash — the CAPPED twin is the board entry (the unthinned pair set
    // grows quadratically inside a source family, which is exactly what
    // the hot-band stride bounds; cap=1 makes the stride fire everywhere,
    // so the measured plan is the guard path 100 TB runs)
    "mm_image_neardup_thinned",
    // round-13: BPE merge learning on the board — per round one
    // map-combined pair-count shuffle + TakeOrdered(1), the dominant cost
    // a distributed tokenizer trainer pays at any corpus size
    "text_bpe_merges",
    // round-13: the high-churn as-of twin (union + one keyed window, no
    // join fan-out), the native resize, and the end-to-end curation
    // pipeline — the composition number a training-data run actually pays
    "j_asof_compact", "mm_image_resize", "pipeline_curate_pack",
    // round-13 batch 2: mergeable KLL quantile sketches — build per
    // (source, lang), merge the serialized images to one global sketch,
    // probe 4 ranks; the shuffle is one ≤8 KB sketch per group per
    // partition, the pattern any-range percentile rollups pay at 100 TB
    "sketch_quantiles_rollup",
    // round-13 batch 3: theta-sketch contamination report — each corpus
    // side folds to ONE sketch map-side, the set algebra runs on two
    // single-row frames; the 100 TB cost is the two scans, nothing else
    "sketch_theta_contam",
    // round-13 batch 4: the storage-layout write paths. The co-located
    // join's first rep pays the one-time bucketed layout write; the timed
    // steady state is the zero-exchange sort-merge join (the fact-fact
    // join 100 TB can't broadcast). The COW upsert re-merges and rewrites
    // its touched shards EVERY rep — the number is the real incremental
    // write path, not a cached read
    "j_bucketed_colocated", "lake_cow_upsert",
    // round-13 batch 4: the incremental-curation replay number — the
    // fixed cost a delta run pays before touching anything new (batch
    // curation pass + fingerprint-index anti join; corpus text unread)
    "lake_incr_curate",
    // round-14: incremental near-dup maintenance — three id-ordered
    // batches deduped against (and appended to) a persisted signature
    // index, index wiped per rep; the number is the full maintenance
    // cycle a continuously-fed corpus pays, writes included — text
    // (MinHash bands + shingle sets) and embedding (RP-LSH buckets +
    // vectors) twins
    "dedup_incr_kept", "dedup_incr_emb_kept",
    // round-15: the at-scale index layout twins — 8-byte xxhash64
    // verification keys for the text index (same oracle as the string
    // form) and int8-quantized vectors for the embedding index (own
    // oracle replaying the quantization)
    "dedup_incr_kept_hashed", "dedup_incr_emb_kept_q8",
    // round-16: the READ-ONLY probes — index the retained half once,
    // filter the incoming half against it with no index mutation (each
    // rep pays one index build + one probe, writes included)
    "dedup_incr_probe_kept", "dedup_incr_emb_probe_kept",
    // round-17: DSIR importance resampling — hashed-n-gram target/raw
    // models fit from B-row collected totals, exact-integer doc weights,
    // histogram-cut Gumbel draw; the full select-like-the-target pass a
    // pre-training data run pays over the raw corpus. The model twin is
    // the fit→persist→reload→serve lifecycle (serving itself is a
    // zero-shuffle projection, PlanSpec-pinned)
    "sample_dsir_kept", "dsir_model_score",
    // round-18: the weights leg alone — the zero-shuffle apply pass
    // (PlanSpec-pinned Scan→Project, shuffled bytes independent of
    // corpus size) gets its own cross-round official number — and the
    // multi-target form (three domains' λ folded over one shared
    // hashed-bucket array, one scan, zero exchanges)
    "sample_dsir_weights", "sample_dsir_multi",
    // round-19: the 3-gate model lifecycle (fitPerDomain → three atomic
    // publishes → reload → one shared-scan multi-gate serve) — green
    // oracle row since r18, now with an official board slot
    "dsir_multi_model_score")
}
