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

  /** [[asOfJoin]] re-expressed as union + one keyed window — the
    * HIGH-CHURN scale path. The equi-join form materializes every
    * (left row × at-or-before version) match before its reduce; for a
    * dimension with V versions per key that is a V× fan-out the shuffle
    * must carry. Here both sides union into one stream tagged
    * version=0 / fact=1, one window partitioned by key and ordered by
    * (ts, tag, version-payload) attaches the running `last` version
    * struct (ignoreNulls) to every row, and facts are filtered back out:
    * ONE hash exchange, per-row state instead of per-match rows, no join
    * anywhere in the plan (AsOfSpec pins both the equality to
    * [[asOfJoin]] — ties, unmatched rows, identical tie-break — and the
    * exchange count).
    *
    * Same contract as [[asOfJoin]]: sides share only `keyCol`, left rows
    * unique. Tie policy is identical: a version AT the fact's timestamp
    * applies (versions sort before facts at equal ts), and same-(key, ts)
    * versions resolve to the lexicographic max of (rightTs, remaining
    * right columns) — the window's sort-then-last replays max_by's
    * ordering struct.
    */
  def asOfJoinCompact(left: DataFrame, right: DataFrame, keyCol: String,
      leftTs: String, rightTs: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val overlap = left.columns.toSet.intersect(right.columns.toSet)
    require(overlap == Set(keyCol),
      s"left/right may share only the key '$keyCol', shared: ${overlap.mkString(", ")}")
    require(left.columns.contains(leftTs) && right.columns.contains(rightTs),
      s"timestamp columns '$leftTs'/'$rightTs' must exist on their sides")
    Seq("__asof_ts", "__asof_tag", "__asof_v", "__asof_f").foreach { n =>
      require(!left.columns.contains(n) && !right.columns.contains(n),
        s"column name '$n' is reserved by AsOf.asOfJoinCompact")
    }
    val rightCols = right.columns.filterNot(_ == keyCol).toSeq
    val leftCols = left.columns.filterNot(_ == keyCol).toSeq
    // version payload struct leads with rightTs: the window's
    // (ts, tag, __asof_v) sort then makes `last` pick exactly max_by's
    // (rightTs, remaining-columns) survivor among same-ts versions
    val vStruct = struct((col(rightTs) +: rightCols.filterNot(_ == rightTs).map(col)): _*)
    // null-key / null-timestamp VERSIONS can never win the equi-join
    // form's `rightTs <= leftTs` predicate (SQL three-valued logic), but
    // the window sorts nulls FIRST, where they would silently enrich
    // facts — drop them here so the two forms stay exact twins on all
    // inputs. Null-ts facts need no handling: with null versions gone
    // they sort before every version and read a null running state,
    // exactly the equi-join form's unmatched-left contract.
    val versions = right.filter(col(keyCol).isNotNull && col(rightTs).isNotNull).select(
      col(keyCol), col(rightTs).as("__asof_ts"), lit(0).as("__asof_tag"),
      vStruct.as("__asof_v"),
      lit(null).cast(org.apache.spark.sql.types.StructType(
        left.selectExpr(leftCols: _*).schema.fields)).as("__asof_f"))
    val facts = left.select(
      col(keyCol), col(leftTs).as("__asof_ts"), lit(1).as("__asof_tag"),
      lit(null).cast(versions.schema("__asof_v").dataType).as("__asof_v"),
      struct(leftCols.map(col): _*).as("__asof_f"))
    val w = Window.partitionBy(keyCol)
      .orderBy(col("__asof_ts"), col("__asof_tag"), col("__asof_v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val ordered = versions.unionByName(facts)
      .withColumn("__asof_v", last(col("__asof_v"), ignoreNulls = true).over(w))
    val vOut = rightCols.map { c =>
      val src = if (c == rightTs) col("__asof_v").getField(rightTs)
                else col("__asof_v").getField(c)
      src.as(c)
    }
    ordered.filter(col("__asof_tag") === 1)
      .select((col(keyCol) +: leftCols.map(c => col(s"__asof_f.$c").as(c))) ++ vOut: _*)
      .select(left.columns.map(col).toSeq ++ rightCols.map(col): _*)
  }
}
