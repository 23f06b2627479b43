package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
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

  /** A named row-level data-quality constraint: `predicate` must hold on
    * at least `minPassFrac` of rows (1.0 = every row). A null predicate
    * result counts as a violation — unknown is not a pass.
    */
  case class Expectation(name: String, predicate: Column, minPassFrac: Double = 1.0) {
    require(minPassFrac >= 0 && minPassFrac <= 1,
      s"minPassFrac=$minPassFrac must be in [0,1]")
  }

  /** Deequ-style expectation suite in ONE aggregation pass: every check's
    * violation count rides the same map-side-combined scan (no per-check
    * job, no per-check shuffle — the whole report is one reduce of
    * |checks| longs). Output: one row per check — (check, n_rows,
    * n_violations, pass_micro, passed) with pass_micro the 6dp-floored
    * pass fraction (empty input passes vacuously: no rows violate).
    *
    * This is the CI gate shape for data pipelines: compute once per
    * snapshot, alert on `passed = false`, diff `pass_micro` across
    * snapshots to catch drift before it reaches training.
    */
  def expectations(df: DataFrame, checks: Seq[Expectation]): DataFrame = {
    require(checks.nonEmpty, "expectations needs at least one check")
    require(checks.map(_.name).distinct.size == checks.size,
      s"duplicate check names in ${checks.map(_.name)}")
    val aggs = checks.map { e =>
      sum(when(coalesce(e.predicate, lit(false)), 0L).otherwise(1L))
        .as(s"__viol_${e.name}")
    }
    val one = df.agg(count(lit(1)).as("__rows"), aggs: _*)
    val entries = checks.map { e =>
      val viol = coalesce(col(s"__viol_${e.name}"), lit(0L))
      val passMicro = when(col("__rows") === 0, lit(1000000L))
        .otherwise(floor((col("__rows") - viol).cast("double") /
          col("__rows").cast("double") * lit(1000000.0)).cast("long"))
      struct(
        lit(e.name).as("check"),
        col("__rows").as("n_rows"),
        viol.as("n_violations"),
        passMicro.as("pass_micro"),
        (passMicro >= math.floor(e.minPassFrac * 1000000.0).toLong).as("passed"))
    }
    one.select(explode(array(entries: _*)).as("e")).select("e.*")
  }
}
