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
}
