package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Persistable, mergeable distinct-count sketches (Apache DataSketches HLL
  * via Spark's `hll_*` functions): build one small binary sketch per
  * partition key (day, source, …), PERSIST it, and answer any-range
  * distinct questions later by unioning sketches — never rescanning the
  * raw data. The incremental-warehouse pattern that plain
  * `approx_count_distinct` (whose sketch dies with the query) can't do.
  */
object Sketches {

  /** One HLL sketch per `keyCols` group over `valueCol` — write the result
    * to parquet as the day's distinct-count artifact. `lgK` trades size
    * for accuracy (12 → ~2.5 KB, ~1.6% rse).
    */
  def distinctSketches(df: DataFrame, keyCols: Seq[String], valueCol: String,
      lgK: Int = 12): DataFrame = {
    require(keyCols.nonEmpty, "need at least one sketch key")
    df.groupBy(keyCols.map(col): _*)
      .agg(hll_sketch_agg(col(valueCol), lit(lgK)).as("sketch"),
        count(lit(1)).as("n_rows"))
  }

  /** Roll sketches up to a coarser key set (drop columns, union sketches)
    * and estimate — e.g. daily → monthly, per-source → global. Input is
    * [[distinctSketches]] output (possibly read back from parquet, possibly
    * a union of many days — that's the point).
    */
  def rollupEstimate(sketches: DataFrame, keepKeys: Seq[String]): DataFrame = {
    val grouped =
      if (keepKeys.isEmpty) sketches.groupBy()
      else sketches.groupBy(keepKeys.map(col): _*)
    grouped
      .agg(hll_sketch_estimate(hll_union_agg(col("sketch"))).as("approx_distinct"),
        sum("n_rows").as("n_rows"))
  }

  /** One mergeable KLL quantile sketch per `keyCols` group over `valueCol`
    * (nulls excluded from both the sketch and `n_rows`) — the quantile twin
    * of [[distinctSketches]]; persist the output as the day's distribution
    * artifact. Shuffle = one ≤ O(k log n)-byte sketch per group per
    * partition (map-side partial agg), never the raw values. Exact while a
    * group has ≤ k values; ~0.7% normalized rank error at the default
    * k=1024 beyond that.
    */
  def quantileSketches(df: DataFrame, keyCols: Seq[String], valueCol: String,
      k: Int = org.apache.spark.sql.graft.KllOps.DefaultK): DataFrame = {
    require(keyCols.nonEmpty, "need at least one sketch key")
    val rows = df.filter(col(valueCol).isNotNull)
    rows.groupBy(keyCols.map(col): _*)
      .agg(graft.functions.Native.kllAgg(col(valueCol).cast("double"), k).as("qsketch"),
        count(lit(1)).as("n_rows"))
  }

  /** Roll quantile sketches up to a coarser key set (drop columns, union
    * sketches) and answer `ranks` (INCLUSIVE / `cume_dist` semantics) —
    * daily → monthly, per-source → global — from [[quantileSketches]]
    * output, possibly read back from parquet, possibly a union of many
    * days. Emits `q_<rank_pct>` columns plus `n_rows`.
    */
  def rollupQuantiles(sketches: DataFrame, keepKeys: Seq[String],
      ranks: Seq[Double],
      k: Int = org.apache.spark.sql.graft.KllOps.DefaultK): DataFrame = {
    require(ranks.nonEmpty, "need at least one rank")
    val grouped =
      if (keepKeys.isEmpty) sketches.groupBy()
      else sketches.groupBy(keepKeys.map(col): _*)
    val merged = grouped
      .agg(graft.functions.Native.kllMerge(col("qsketch"), k).as("qsketch"),
        sum("n_rows").as("n_rows"))
    // stage the probe array as a real column: one heapify+query per group
    // row; CollapseProject keeps the boundary for a non-cheap expression
    // referenced once per rank (the staged-column discipline, SCALE.md)
    val qCols = ranks.zipWithIndex.map { case (r, i) =>
      element_at(col("_qs"), i + 1).as(s"q_${math.round(r * 100)}")
    }
    merged
      .withColumn("_qs", graft.functions.Native.kllQuantiles(col("qsketch"), ranks))
      .select(keepKeys.map(col) ++ qCols ++ Seq(col("n_rows")): _*)
  }

  /** One theta sketch per `keyCols` group over `valueCol`'s distinct values
    * (nulls excluded) — the set-operation-capable sibling of
    * [[distinctSketches]]: HLL sketches only union, theta sketches also
    * intersect and difference, which is what overlap questions need.
    * Persist the output; roll up later with `graft_theta_merge` /
    * `graft_theta_intersect_agg` or pairwise `graft_theta_set_op`.
    */
  def overlapSketches(df: DataFrame, keyCols: Seq[String], valueCol: String,
      lgK: Int = org.apache.spark.sql.graft.ThetaOps.DefaultLgK): DataFrame = {
    require(keyCols.nonEmpty, "need at least one sketch key")
    // null values are invisible to the sketch, so they are excluded from
    // n_rows too — the same rows-the-sketch-saw convention as
    // [[quantileSketches]] and [[corpusOverlap]]
    df.filter(col(valueCol).isNotNull)
      .groupBy(keyCols.map(col): _*)
      .agg(graft.functions.Native.thetaAgg(col(valueCol), lgK).as("tsketch"),
        count(lit(1)).as("n_rows"))
  }

  /** Full overlap report between two corpora on `valueCol`'s distinct
    * values: one row with estimated `n_a`, `n_b`, `n_common`
    * (|A ∩ B| — the contamination count when B is a benchmark), `n_union`,
    * `n_only_a`, and `n_only_b`. Each side collapses to ONE ≤128 KB sketch
    * via map-side partial aggregation (never a shuffle of raw values); the
    * set algebra then runs on the two single-row frames joined by a
    * broadcast of one row. Exact while each side has ≤ `2^lgK` distincts.
    */
  def corpusOverlap(a: DataFrame, b: DataFrame, valueCol: String,
      lgK: Int = org.apache.spark.sql.graft.ThetaOps.DefaultLgK): DataFrame = {
    import graft.functions.Native._
    val sa = a.filter(col(valueCol).isNotNull)
      .agg(thetaAgg(col(valueCol), lgK).as("sk_a"))
    val sb = b.filter(col(valueCol).isNotNull)
      .agg(thetaAgg(col(valueCol), lgK).as("sk_b"))
    sa.crossJoin(broadcast(sb))
      // stage the derived sketches once: each feeds two estimates
      .withColumn("_common", thetaIntersect(col("sk_a"), col("sk_b")))
      .withColumn("_union", thetaUnionPair(col("sk_a"), col("sk_b")))
      .select(
        thetaEstimate(col("sk_a")).as("n_a"),
        thetaEstimate(col("sk_b")).as("n_b"),
        thetaEstimate(col("_common")).as("n_common"),
        thetaEstimate(col("_union")).as("n_union"),
        thetaEstimate(thetaANotB(col("sk_a"), col("sk_b"))).as("n_only_a"),
        thetaEstimate(thetaANotB(col("sk_b"), col("sk_a"))).as("n_only_b"))
  }
}
