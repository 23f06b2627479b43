package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import graft.ops.{Dedup, Text}

/** Streaming near-duplicate detection: MinHash+LSH banding over a document
  * STREAM, with bucket-keyed state — the incremental twin of the batch
  * [[graft.ops.Dedup.minhashCandidatePairs]] pipeline.
  *
  * Shape: per-row inline signatures (a stream row is one complete document,
  * so the batch path's explode→groupBy signature aggregation — which would
  * be a second stateful operator here — is unnecessary) → explode band keys
  * → `flatMapGroupsWithState` keyed by (band, band_key). State per bucket is
  * ONE long: the smallest doc id the bucket has ever seen.
  *
  * Output: (doc_id, band, bucket_rep) per (doc × band). A doc is a near-dup
  * CANDIDATE iff any of its rows has bucket_rep < doc_id — the streaming
  * form of the batch keeper rule (lower-id bucket-mate exists). The per-doc
  * verdict composes downstream (foreachBatch / sink-side), keeping this a
  * single stateful operator.
  *
  * Determinism: the representative is the MIN id over everything seen so
  * far (not arrival order within a micro-batch), so results don't depend on
  * partition iteration order. Scale: state is one long per OCCUPIED bucket;
  * [[bucketFirstSeenWithHorizon]] is the unbounded-run form — an event-time
  * timeout evicts buckets idle past the dedup horizon, bounding state to
  * horizon-active buckets.
  */
object StreamingLsh {

  /** Per-row MinHash band keys, staged through real projections (toks →
    * token hashes → shingle bases) so Catalyst reuses each stage instead of
    * inlining the tokenizer into every shingle position (the measured-10×
    * trap documented in Dedup.scala).
    */
  /** `carry` = (outputName, expression) pairs computed off the raw input
    * row and carried through the band explode (e.g. the event timestamp
    * for horizon eviction).
    */
  private[graft] def withBandKeys(df: DataFrame, textCol: String, idCol: String,
      k: Int, bands: Int, carry: Seq[(String, Column)] = Nil): DataFrame = {
    val wide = withWideBandKeys(df, textCol, idCol, k, bands, carry)
    val carried = carry.map { case (n, _) => col(n) }
    val bandStructs = (0 until bands).map { b =>
      struct(lit(b).as("band"), col(s"band_key_$b").as("band_key"))
    }
    wide.select(col("doc_id") +: carried :+ explode(array(bandStructs: _*)).as("bk"): _*)
      .select(col("doc_id") +: carried :+ col("bk.band").as("band") :+
        col("bk.band_key").as("band_key"): _*)
  }

  /** WIDE form of [[withBandKeys]]: one row per doc with `band_key_0..b-1`
    * columns plus the doc's distinct shingle set (`shs`, `nsh`) from the
    * same projection chain — so callers that need both signatures and
    * shingles (the verify path) never self-join the stream.
    */
  private[graft] def withWideBandKeys(df: DataFrame, textCol: String, idCol: String,
      k: Int, bands: Int, carry: Seq[(String, Column)] = Nil): DataFrame = {
    require(k % bands == 0 && k <= Dedup.seedConsts.size, "k must split into equal bands")
    val r = k / bands
    val carryCols = carry.map { case (n, c) => c.as(n) }
    // r21: the same native base/seed-min/distinct-shingle kernels as the
    // batch path (Dedup.minhashSignatures / distinctShingleSets) — the
    // old interpreted HOF chain (transform h32 per token, transform
    // combine3 per shingle, array_min(transform) per seed) was this
    // stream's dominant per-row cost; values are bit-identical
    // (spec-pinned batch ≡ stream agreement is unchanged)
    val bases = when(col(textCol).isNull, array(lit(null).cast("long")))
      .otherwise(org.apache.spark.sql.graft.ShingleFns.shingleBases(col(textCol)))
    val shsCol = when(col(textCol).isNull, array(lit(null).cast("string")))
      .otherwise(org.apache.spark.sql.graft.DistinctShingles
        .distinctShingles(col(textCol)))
    val staged = df
      .select(col(idCol).cast("long").as("doc_id") +: col(textCol) +: carryCols: _*)
      .withColumn("__sigs", org.apache.spark.sql.graft.SeedMins
        .seedMins(bases, Dedup.seedConsts.take(k)))
      .withColumn("shs", shsCol)
    val sigCols: Seq[Column] = (0 until k).map { s =>
      element_at(col("__sigs"), s + 1).as(s"sig_$s")
    }
    val carried = carry.map { case (n, _) => col(n) }
    val sigs = staged.select(col("doc_id") +: col("shs") +: (carried ++ sigCols): _*)
    val keyCols = (0 until bands).map { b =>
      md5(concat_ws("_", (b * r until (b + 1) * r).map(i => col(s"sig_$i")): _*))
        .as(s"band_key_$b")
    }
    sigs.select(col("doc_id") +: col("shs") +: size(col("shs")).as("nsh") +:
      (carried ++ keyCols): _*)
  }

  /** (doc_id, band, bucket_rep) stream — see object doc. `df` must be a
    * streaming DataFrame with `idCol` castable to long.
    */
  def bucketFirstSeen(df: DataFrame, textCol: String, idCol: String,
      k: Int = 8, bands: Int = 2): Dataset[(Long, Int, Long)] = {
    val banded = withBandKeys(df, textCol, idCol, k, bands)
    import banded.sparkSession.implicits._
    banded.as[(Long, Int, String)]
      .groupByKey { case (_, band, key) => (band, key) }
      .flatMapGroupsWithState[Long, (Long, Int, Long)](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (key: (Int, String), rows: Iterator[(Long, Int, String)], state: GroupState[Long]) =>
          val docs = rows.map(_._1).toVector
          val rep = math.min(state.getOption.getOrElse(Long.MaxValue), docs.min)
          state.update(rep)
          docs.iterator.map(d => (d, key._1, rep))
      }
  }

  /** [[bucketFirstSeen]] with a DEDUP HORIZON — the eviction policy the
    * unbounded-run deployment needs: a bucket's state (min-id
    * representative + last-activity event time) is dropped once the
    * watermark passes `lastTs + horizon`, so steady-state state is one
    * entry per bucket ACTIVE WITHIN THE HORIZON, not per bucket ever seen.
    * A re-arrival after eviction becomes its own representative again —
    * the explicit semantic of a horizon ("only dedup against documents
    * seen in the last H"), not a cache miss.
    *
    * Event-time (not processing-time) timeout: eviction is driven by the
    * data's own clock, so replays and backfills evict identically —
    * deterministic recovery, deterministic tests.
    */
  def bucketFirstSeenWithHorizon(df: DataFrame, textCol: String, idCol: String,
      tsCol: String, watermark: String, horizonMs: Long,
      k: Int = 8, bands: Int = 2): Dataset[(Long, Int, Long)] = {
    require(horizonMs > 0, s"horizonMs must be positive, got $horizonMs")
    // the watermarked event-time column rides the band explode UNALTERED
    // (its watermark metadata must reach the stateful operator)
    val banded = withBandKeys(
        df.withWatermark(tsCol, watermark), textCol, idCol, k, bands,
        carry = Seq("__ts" -> col(tsCol)))
    import banded.sparkSession.implicits._
    banded.select(col("doc_id"), col("band"), col("band_key"), col("__ts"))
      .as[(Long, Int, String, java.sql.Timestamp)]
      .groupByKey { case (_, band, key, _) => (band, key) }
      .flatMapGroupsWithState[(Long, Long), (Long, Int, Long)](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (key: (Int, String), rows: Iterator[(Long, Int, String, java.sql.Timestamp)],
            state: GroupState[(Long, Long)]) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            val docs = rows.map(r => (r._1, r._4.getTime)).toVector
            val (rep0, last0) = state.getOption.getOrElse((Long.MaxValue, Long.MinValue))
            val rep = math.min(rep0, docs.map(_._1).min)
            val last = math.max(last0, docs.map(_._2).max)
            state.update((rep, last))
            // must exceed the current watermark or Spark rejects it; the
            // max() only fires for late data already past its horizon
            state.setTimeoutTimestamp(
              math.max(last + horizonMs, state.getCurrentWatermarkMs + 1L))
            docs.iterator.map { case (d, _) => (d, key._1, rep) }
          }
      }
  }

  /** Streaming cross-corpus near-dup detection: a document STREAM (the
    * arriving crawl) verified against a STATIC reference corpus (the
    * retained training set) — the incremental twin of
    * [[graft.ops.Dedup.crossCorpusPairs]], and the shape a production
    * ingest gate actually runs.
    *
    * Entirely STATELESS: per-row inline signatures + shingles on the stream
    * (one projection chain — a stream row is one whole document, so no
    * self-join), then one stream-static LEFT join PER BAND against that
    * band's capped ref bucket lists, candidate union per row
    * (`array_distinct` over the per-band lists — each (doc, ref) pair
    * verifies exactly once, no streaming dropDuplicates state), explode,
    * and a final stream-static join to the ref shingle sets with the
    * Jaccard verify as a per-row filter. No watermark, no state store;
    * recovery is free. Emits one row per VERIFIED (doc, ref) match in
    * append mode; a doc with zero emitted rows is novel.
    *
    * Scale: fan-out per stream row is bounded by bands × `maxBucket`
    * (over-cap ref buckets are dropped at build time, same contract as the
    * batch op). The static side is re-planned per micro-batch — pass a
    * PERSISTED `ref` (or a parquet-backed table) so the bucket build isn't
    * repeated per trigger; with default thresholds AQE broadcasts genuinely
    * small ref sides.
    */
  def crossCorpusMatches(probeStream: DataFrame, ref: DataFrame,
      textCol: String, idCol: String, minJaccard: Double = 0.8, k: Int = 8,
      bands: Int = 2, maxBucket: Int = 1000): DataFrame = {
    val probe = withWideBandKeys(probeStream, textCol, idCol, k, bands)
      .withColumnRenamed("shs", "sh_a").withColumnRenamed("nsh", "n_a")
    val rBands = Dedup.lshBands(ref, textCol, idCol, k, bands)
      .groupBy("band", "band_key")
      .agg(collect_list(col(idCol).cast("long")).as("ref_docs"))
      .filter(size(col("ref_docs")) <= maxBucket)
    val joined = (0 until bands).foldLeft(probe) { (acc, b) =>
      acc.join(
        rBands.filter(col("band") === b)
          .select(col("band_key").as(s"band_key_$b"), col("ref_docs").as(s"ref_docs_$b")),
        Seq(s"band_key_$b"), "left")
    }
    val allRefs = array_distinct(concat(
      (0 until bands).map(b =>
        coalesce(col(s"ref_docs_$b"), typedLit(Array.empty[Long]))): _*))
    val rShs = Dedup.distinctShingleSets(
        ref.select(col(idCol).cast("long").as("ref_id"), col(textCol)),
        textCol, "ref_id")
      .select(col("ref_id"), col("shs").as("sh_b"), col("nsh").as("n_b"))
    val uni = (col("n_a") + col("n_b") - col("inter")).cast("double")
    joined
      .select(col("doc_id"), col("sh_a"), col("n_a"), explode(allRefs).as("ref_id"))
      .join(rShs, "ref_id")
      .select(col("doc_id"), col("ref_id"), col("n_a"), col("n_b"),
        size(array_intersect(col("sh_a"), col("sh_b"))).as("inter"))
      .select(col("doc_id"), col("ref_id"),
        when(uni > 0, col("inter").cast("double") / uni).otherwise(lit(0.0)).as("jaccard"))
      .filter(col("jaccard") >= minJaccard)
  }

  /** Streaming EMBEDDING near-dup candidates: the same bucket-keyed
    * min-id state machine over RP-LSH buckets of a vector stream (the
    * incremental twin of [[graft.ops.Similarity.bucketedTopK]]'s candidate
    * generation; multi-probe = call with `probes > 0` to also enter the
    * Hamming-1 buckets, trading state entries for recall exactly like the
    * batch multi-probe). A vector is a candidate iff any emitted row has
    * `bucket_rep < vec_id`.
    */
  def embeddingBucketFirstSeen(df: DataFrame, vecCol: String, idCol: String,
      dim: Int, planes: Int = 8, probes: Int = 0): Dataset[(Long, Int, Long)] = {
    require(probes >= 0 && probes <= planes, s"probes must be in [0,$planes]")
    val base = df.select(col(idCol).cast("long").as("vec_id"),
      graft.ops.Similarity.lshBucket(col(vecCol), dim, planes).as("bucket"))
    // probe list: home bucket + `probes` single-bit flips, exploded per row
    val buckets =
      if (probes == 0) base.select(col("vec_id"), col("bucket"))
      else base.select(col("vec_id"), explode(array(
        (col("bucket") +: (0 until probes).map(p =>
          col("bucket").bitwiseXOR(lit(1 << p)))).toIndexedSeq: _*)).as("bucket"))
    import buckets.sparkSession.implicits._
    buckets.select(col("vec_id"), col("bucket").cast("int"))
      .as[(Long, Int)]
      .groupByKey(_._2)
      .flatMapGroupsWithState[Long, (Long, Int, Long)](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (bucket: Int, rows: Iterator[(Long, Int)], state: GroupState[Long]) =>
          val ids = rows.map(_._1).toVector
          val rep = math.min(state.getOption.getOrElse(Long.MaxValue), ids.min)
          state.update(rep)
          ids.iterator.map(v => (v, bucket, rep))
      }
  }
}
