package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.ops.Text.h32

/** Deterministic sequence packing: assign each document to a fixed
  * token-budget training bin (the "pack short docs into 8k-token training
  * sequences" step of an LLM data pipeline), reproducibly across runs and
  * cluster shapes.
  *
  * Exact packing needs a TOTAL ORDER and a running token total — the naive
  * form (one window over the whole corpus) serializes 100 TB through a
  * single reducer. This is the scalable two-level prefix sum instead:
  *
  *  1. each doc gets a deterministic position (hash bucket, then hash
  *     within bucket) — no data-dependent sampling, so the order is stable
  *     across partitioning/cluster shape, unlike a rangepartitioned sort;
  *  2. cumulative sums run per-bucket in parallel (window partitioned by
  *     bucket — reducer state is corpus/`buckets`, sized by the `buckets`
  *     knob like shuffle partitions);
  *  3. bucket totals (a `buckets`-row side table) get prefix offsets in a
  *     single tiny window and broadcast back; global position = bucket
  *     offset + within-bucket cumsum.
  *
  * Bin = floor(tokens-before-this-doc / budget): contiguous chunking, so a
  * bin can overshoot the budget by at most one document — the standard
  * greedy approximation, but deterministic and one-pass.
  */
object Packing {

  def assignBins(df: DataFrame, idCol: String, tokenCol: String, budget: Long,
      buckets: Int = 1024, salt: String = "pack"): DataFrame = {
    require(budget > 0, s"budget must be positive, got $budget")
    require(buckets > 0, s"buckets must be positive, got $buckets")
    val base = df.select(
      col(idCol),
      col(tokenCol).cast("long").as("toks"),
      h32(concat(col(idCol).cast("string"), lit("_" + salt))).as("h"))
      .withColumn("bucket", pmod(col("h"), lit(buckets)))
    // ROWS frame pinned explicitly: the (h, id) order key is unique, but
    // RANGE (the default) would group peers if it ever weren't
    val perBucket = Window.partitionBy("bucket")
      .orderBy(col("h"), col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val withCum = base.withColumn("cum_in", sum("toks").over(perBucket))
    // bucket offsets: `buckets` rows through one single-partition window —
    // bounded by the knob, not the corpus (same shape as the histogram
    // percentile side table)
    val prefix = Window.orderBy("bucket")
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = base.groupBy("bucket").agg(sum("toks").as("btot"))
      .withColumn("boff", coalesce(sum("btot").over(prefix), lit(0L)))
      .select("bucket", "boff")
    withCum.join(broadcast(offsets), Seq("bucket"))
      .select(col(idCol), col("bucket"), col("toks"),
        floor((col("boff") + col("cum_in") - col("toks")).cast("double")
          / lit(budget.toDouble)).cast("long").as("bin"))
  }

  /** Materialize the packed training sequences: [[assignBins]] + ordered
    * concatenation per bin (docs in their global packing order, `sep`
    * between them). The per-bin collect is bounded by the BUDGET — a bin
    * never holds more than budget + one straddling doc of tokens — so
    * unlike a per-group collect over raw data this cannot OOM a reducer at
    * any corpus size.
    */
  def packTexts(df: DataFrame, idCol: String, textCol: String, tokenCol: String,
      budget: Long, buckets: Int = 1024, salt: String = "pack",
      sep: String = " <|doc|> "): DataFrame = {
    val bins = assignBins(df, idCol, tokenCol, budget, buckets, salt)
      // re-derive the in-bin order key (same hash assignBins positioned by)
      .withColumn("h", h32(concat(col(idCol).cast("string"), lit("_" + salt))))
    bins.join(df.select(col(idCol), col(textCol)), Seq(idCol))
      .groupBy("bin")
      .agg(
        array_join(
          transform(
            array_sort(collect_list(struct(col("bucket"), col("h"), col(idCol), col(textCol)))),
            x => x.getField(textCol)), sep).as("packed_text"),
        count(lit(1)).as("n_docs"),
        sum("toks").as("total_toks"))
  }

  /** Document boundary offsets inside each packed sequence — what a
    * training loader needs to build attention masks / loss masks over
    * [[packTexts]] output: per (bin, doc), the doc's 1-based pack position
    * and its [start_off, end_off) character span in the concatenated
    * string (separators accounted). Same (bucket, hash, id) order as
    * packTexts, so spans index into `packed_text` exactly
    * (spec-verified by substring extraction).
    *
    * Scale: one per-bin window — partition size is the bin (≈
    * budget/avg-doc), the same bounded-state contract as the concat.
    */
  def packOffsets(df: DataFrame, idCol: String, textCol: String, tokenCol: String,
      budget: Long, buckets: Int = 1024, salt: String = "pack",
      sep: String = " <|doc|> "): DataFrame = {
    val bins = assignBins(df, idCol, tokenCol, budget, buckets, salt)
      .withColumn("h", h32(concat(col(idCol).cast("string"), lit("_" + salt))))
    val joined = bins.join(
      df.select(col(idCol), length(col(textCol)).cast("long").as("__len")), Seq(idCol))
    val w = Window.partitionBy("bin").orderBy(col("bucket"), col("h"), col(idCol))
    joined
      .withColumn("pos", row_number().over(w).cast("long"))
      .withColumn("__prev", coalesce(
        sum("__len").over(w.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn("start_off", col("__prev") + (col("pos") - 1) * lit(sep.length.toLong))
      .select(col("bin"), col(idCol), col("pos"), col("start_off"),
        (col("start_off") + col("__len")).as("end_off"))
  }

  /** Length-bucketed batching audit — the pad-vs-truncate economics of
    * fixed-shape training batches. Each doc lands in the smallest ladder
    * bucket that holds its token count (docs past the top rung are
    * TRUNCATED to it — the long-tail cut every fixed-context loader makes);
    * per bucket the op reports the padding and truncation the choice of
    * ladder costs:
    *
    *   n_docs, total_tokens (pre-cut), padding_tokens = Σ (rung − kept),
    *   truncated_docs, cut_tokens = Σ (len − rung)⁺, and
    *   util_micro = 10⁶ · Σ kept div (n_docs·rung) — batch utilization in
    *   exact micro units.
    *
    * The ladder is a plan-time constant (a `when` chain over ≤ ~16 rungs —
    * codegen'd per-row arithmetic, no join), so the whole audit is ONE
    * map-side-combined groupBy to |ladder| rows at any corpus size. Tuning
    * loop: widen rungs → less padding, more truncation; this op prices
    * both sides exactly.
    */
  def lengthBuckets(df: DataFrame, tokenCol: String,
      ladder: Seq[Long]): DataFrame = {
    require(ladder.nonEmpty && ladder == ladder.sorted && ladder.distinct == ladder,
      s"ladder must be non-empty, strictly ascending, got $ladder")
    require(ladder.head > 0, s"ladder rungs must be positive, got $ladder")
    val n = col(tokenCol).cast("long")
    val rung = ladder.init.foldRight(lit(ladder.last): Column) {
      (r, rest) => when(n <= r, lit(r)).otherwise(rest)
    }
    df.filter(n.isNotNull)
      .select(n.as("__n"), rung.as("bucket_len"))
      .withColumn("__kept", least(col("__n"), col("bucket_len")))
      .groupBy("bucket_len")
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("__n")).as("total_tokens"),
        sum(col("bucket_len") - col("__kept")).as("padding_tokens"),
        sum(when(col("__n") > col("bucket_len"), 1L).otherwise(0L)).as("truncated_docs"),
        sum(greatest(col("__n") - col("bucket_len"), lit(0L))).as("cut_tokens"),
        sum(col("__kept")).as("__keptsum"))
      .withColumn("util_micro",
        expr("(1000000 * __keptsum) div (n_docs * bucket_len)"))
      .drop("__keptsum")
  }
}
