package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Dataset profiling: per-column row/null/distinct/min/max in ONE pass —
  * the data-quality report a pipeline runs before and after every
  * transformation stage (and diffs across snapshots to catch drift).
  */
object Profile {

  /** Profile `colNames` of `df` in a single aggregation. Output: one row
    * per column — (column_name, n_rows, n_null, n_distinct, min_value,
    * max_value), min/max cast to string so heterogeneous column types fit
    * one schema.
    *
    * Scale: `approxDistinct = true` (default) uses HLL++
    * (`approx_count_distinct`, one mergeable sketch per column, single
    * reduce) — the 100 TB path. Exact distinct (`false`) is
    * oracle-comparable but plans an Expand: the scan is replicated
    * (#cols + 1)× into the shuffle, which is the documented price of
    * exact multi-column NDV in one pass; flip it on only for bounded
    * audits. Everything else (count/min/max) partial-aggregates map-side
    * either way.
    */
  def columns(df: DataFrame, colNames: Seq[String],
      approxDistinct: Boolean = true): DataFrame = {
    require(colNames.nonEmpty, "profile needs at least one column")
    val aggs = colNames.flatMap { c =>
      Seq(
        count(col(c)).as(s"__cnt_$c"),
        (if (approxDistinct) approx_count_distinct(col(c))
         else count_distinct(col(c))).as(s"__nd_$c"),
        min(col(c)).cast("string").as(s"__min_$c"),
        max(col(c)).cast("string").as(s"__max_$c"))
    }
    val one = df.agg(count(lit(1)).as("__rows"), aggs: _*)
    val entries = colNames.map { c =>
      struct(
        lit(c).as("column_name"),
        col("__rows").as("n_rows"),
        (col("__rows") - col(s"__cnt_$c")).as("n_null"),
        col(s"__nd_$c").cast("long").as("n_distinct"),
        col(s"__min_$c").as("min_value"),
        col(s"__max_$c").as("max_value"))
    }
    one.select(explode(array(entries: _*)).as("p")).select("p.*")
  }
}
