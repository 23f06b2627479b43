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
}
