package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Temporal AS-OF join — the batch twin of the reference's stream-table
  * join semantics: a KTable lookup joins each stream record to the table
  * version current AT the record's timestamp (reference
  * `KStreamKTableJoinIntTest.java` exercises the lookup path; KS resolves
  * it by timestamp-ordered processing). Spark has no native as-of join;
  * this composes one from primitives Catalyst already optimizes: an
  * equi-join on the key with the time inequality as a residual condition,
  * then a map-side-combinable `max_by` picking the latest version per left
  * row. Version-timestamp ties break by the full right-row ordering —
  * deterministic, same policy as JdbcSink's upsert survivor.
  *
  * Scale: the join is a hash equi-join on the key (broadcast or shuffle,
  * AQE's call); pre-reduce fan-out = versions per key, and the `max_by`
  * partial-aggregates map-side so the post-join shuffle carries one
  * candidate per left row per partition. For high-churn version tables,
  * compact versions first or bucket both sides on the key.
  */
object AsOf {

  /** Join each `left` row to the single `right` row with the same key and
    * the greatest `rightTs` <= `leftTs`; unmatched left rows keep nulls.
    * `left` and `right` may share ONLY the key column, and left rows must
    * be unique (they are the group key of the final reduce).
    */
  def asOfJoin(left: DataFrame, right: DataFrame, keyCol: String,
      leftTs: String, rightTs: String): DataFrame = {
    val overlap = left.columns.toSet.intersect(right.columns.toSet)
    require(overlap == Set(keyCol),
      s"left/right may share only the key '$keyCol', shared: ${overlap.mkString(", ")}")
    require(left.columns.contains(leftTs) && right.columns.contains(rightTs),
      s"timestamp columns '$leftTs'/'$rightTs' must exist on their sides")
    Seq("__asof_key", "__asof_row").foreach { n =>
      require(!left.columns.contains(n) && !right.columns.contains(n),
        s"column name '$n' is reserved by AsOf.asOfJoin")
    }
    val rkey = "__asof_key"
    val r = right.withColumnRenamed(keyCol, rkey)
    val joined = left.join(r,
      col(keyCol) === col(rkey) && col(rightTs) <= col(leftTs), "left")
    val rightCols = r.columns.filterNot(_ == rkey).toSeq
    val ord = struct((col(rightTs) +: rightCols.filterNot(_ == rightTs).map(col)): _*)
    joined.groupBy(left.columns.map(col).toSeq: _*)
      .agg(max_by(struct(rightCols.map(col): _*), ord).as("__asof_row"))
      .select(left.columns.map(col).toSeq ++
        rightCols.map(c => col(s"__asof_row.$c").as(c)): _*)
  }
}
