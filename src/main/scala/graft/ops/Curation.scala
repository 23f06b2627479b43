package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The corpus-curation FUNNEL: run the standard pretraining cleaning
  * gauntlet in pipeline order and report how many documents survive each
  * stage — the audit row every corpus build publishes (and the first thing
  * a reviewer asks for: "where did the data go?").
  *
  * Stage order is the one production pipelines use (cheap per-row gates
  * first, joins last, so each join runs on the smallest surviving set):
  *   1. raw            — the input corpus
  *   2. lang_en        — [[Text.langId]] predicts English
  *   3. min_length     — at least `minChars` characters
  *   4. exact_dedup    — one keeper (min id) per normalized-text fingerprint,
  *                       computed AMONG the stage-3 survivors (pipeline
  *                       semantics: each stage sees only what the previous
  *                       one passed)
  *   5. decontaminated — fewer than `minShared` winnowing fingerprints
  *                       shared with the benchmark set ([[Text.decontaminatedKept]])
  *
  * Scale shape: stages 2-3 are per-row projections over one scan; stage 4
  * is one fingerprint groupBy + semi join; stage 5 is the broadcast-
  * benchmark winnow join. The count audit runs one aggregation per stage —
  * persist the input if the corpus scan is the dominant cost and the audit
  * runs alongside the real pipeline output.
  *
  * Output: (stage, stage_idx, n_docs), stage_idx 1-5 in pipeline order.
  */
object Curation {

  def funnel(corpus: DataFrame, benchmark: DataFrame, textCol: String,
      idCol: String, minChars: Int = 200, minShared: Int = 3): DataFrame = {
    require(minChars >= 0, s"minChars must be non-negative, got $minChars")
    val s1 = corpus
    val s2 = s1.join(
      Text.langId(s1, textCol, idCol).filter(col("lang_pred") === "en").select(idCol),
      Seq(idCol), "left_semi")
    val s3 = s2.filter(length(col(textCol)) >= minChars)
    val keepers = Text.fingerprint(s3, textCol, idCol)
      .groupBy("fp_md5").agg(min(col(idCol)).as(idCol))
      .select(idCol)
    val s4 = s3.join(keepers, Seq(idCol), "left_semi")
    val s5 = Text.decontaminatedKept(s4, benchmark, textCol, idCol, minShared = minShared)
    val stages = Seq(
      ("raw", 1, s1), ("lang_en", 2, s2), ("min_length", 3, s3),
      ("exact_dedup", 4, s4), ("decontaminated", 5, s5))
    stages.map { case (name, idx, df) =>
      df.agg(count(lit(1)).as("n_docs"))
        .select(lit(name).as("stage"), lit(idx).as("stage_idx"), col("n_docs"))
    }.reduce(_ unionByName _)
  }

  /** STREAMING curation gate with OBSERVED per-stage counters — the
    * ingest-path form of [[funnel]]: filters an arriving document stream
    * through the per-row stages (lang, length) plus decontamination
    * against a static benchmark, and reports how many rows each stage
    * passed PER MICRO-BATCH through `Dataset.observe` — the numbers ride
    * `StreamingQueryProgress.observedMetrics` with ZERO extra jobs (no
    * second aggregation pass, no state).
    *
    * Exact dedup is deliberately absent: it needs cross-batch state, and
    * the streaming twin for that is [[graft.streaming.StreamingLsh]]'s
    * bucket state — this gate stays fully STATELESS (recovery-free,
    * throughput = the stateless projection path). Decontamination is
    * per-row too: the benchmark's winnow fingerprint SET is a one-row
    * static aggregate crossed in by broadcast, and the shared-count is an
    * `array_intersect` against it — benchmarks are small by definition,
    * which is what makes this shape sound.
    *
    * Returns the SURVIVOR stream (original columns); observed metric name
    * `graft_curation_gate` carries raw/lang_en/min_length/decontaminated.
    */
  def observedGate(stream: DataFrame, benchmark: DataFrame, textCol: String,
      idCol: String, minChars: Int = 200, minShared: Int = 3,
      k: Int = 8, w: Int = 4): DataFrame = {
    val bfps = Text.winnowFingerprints(benchmark, textCol, idCol, k, w)
      .agg(collect_set(col("fp")).as("__bfps"))
    val outCols = stream.columns.map(col).toSeq
    val norm = regexp_replace(lower(col(textCol)), "\\W+", "")
    Text.withLangPred(stream, textCol, "__lang_pred")
      .withColumn("__lang_ok", col("__lang_pred") === "en")
      .withColumn("__len_ok", length(col(textCol)) >= minChars)
      .withColumn("__norm", norm)
      .withColumn("__fps",
        when(length(col("__norm")) >= k, graft.functions.Native.winnow(col("__norm"), k, w))
          .otherwise(array(Text.h32(col("__norm")))))
      .crossJoin(broadcast(bfps))
      .withColumn("__clean",
        size(array_intersect(col("__fps"), col("__bfps"))) < minShared)
      .observe("graft_curation_gate",
        count(lit(1)).as("raw"),
        sum(when(col("__lang_ok"), 1L).otherwise(0L)).as("lang_en"),
        sum(when(col("__lang_ok") && col("__len_ok"), 1L).otherwise(0L)).as("min_length"),
        sum(when(col("__lang_ok") && col("__len_ok") && col("__clean"), 1L)
          .otherwise(0L)).as("decontaminated"))
      .filter(col("__lang_ok") && col("__len_ok") && col("__clean"))
      .select(outCols: _*)
  }
}
