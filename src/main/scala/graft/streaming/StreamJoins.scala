package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Windowed stream-stream equi-joins — the Spark re-expression of Kafka
  * Streams `JoinWindows.of(windowMs)` (reference call sites:
  * `StreamStreamJoinIntegrationTest.java:82` inner, `:118-142` left,
  * `:175-199` outer).
  *
  * Semantics: match iff join keys are equal AND |ts_left − ts_right| ≤
  * window. Column names are prefixed `l_`/`r_` so both sides' full record
  * survives into the join output (the reference's ValueJoiner sees both
  * values).
  *
  * Divergence from Kafka Streams (documented, SURVEY §7.4): KS 2.1 emits
  * left/outer null-padded rows eagerly and may emit spurious `X-null`
  * followed by `X-y`; Spark emits null-padded rows only once the watermark
  * proves no match can arrive. Final-state equivalence (minus KS's spurious
  * eager nulls) is the contract.
  *
  * Scale: this is an equi-join on the key with a time-range residual —
  * Catalyst plans a shuffle-on-key join (NOT a cartesian product), and in
  * streaming mode the watermark bounds the per-key buffered state to the
  * join window.
  */
object StreamJoins {

  /** Prefix every column; returns (renamed df, key col, ts col). */
  private def prefixed(df: DataFrame, p: String): DataFrame =
    df.toDF(df.columns.map(p + _): _*)

  /** Windowed equi-join of two (batch or streaming) DataFrames that share
    * `keyCol` and an event-time `tsCol`.
    *
    * @param watermarkMs watermark delay for both sides; REQUIRED for
    *   left/full outer joins on streaming inputs (Spark needs it to emit
    *   null-padded rows and evict state). None = no watermark (inner joins,
    *   batch twins, tests with unbounded state).
    */
  def windowed(left: DataFrame, right: DataFrame, keyCol: String, tsCol: String,
      windowMs: Long, joinType: String = "inner",
      watermarkMs: Option[Long] = None): DataFrame = {
    val l0 = prefixed(left, "l_")
    val r0 = prefixed(right, "r_")
    val (l, r) = watermarkMs match {
      case Some(w) =>
        (l0.withWatermark(s"l_$tsCol", s"$w milliseconds"),
          r0.withWatermark(s"r_$tsCol", s"$w milliseconds"))
      case None => (l0, r0)
    }
    val cond: Column =
      col(s"l_$keyCol") === col(s"r_$keyCol") &&
        col(s"r_$tsCol") >= col(s"l_$tsCol") - expr(s"INTERVAL $windowMs MILLISECONDS") &&
        col(s"r_$tsCol") <= col(s"l_$tsCol") + expr(s"INTERVAL $windowMs MILLISECONDS")
    l.join(r, cond, joinType)
  }

  /** The reference's ValueJoiner `v1 + "-" + v2`
    * (`AbstractJoinIntegrationTest.java:118-123`), null-printing like Java
    * string concat ("A-null" for an unmatched left in outer joins).
    */
  def dashJoin(l: Column, r: Column): Column =
    concat(coalesce(l.cast("string"), lit("null")), lit("-"),
      coalesce(r.cast("string"), lit("null")))
}
