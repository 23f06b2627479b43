package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, Dataset, Encoder, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

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

  /** One table-changelog update: the dimension's new value for `key` as of
    * event-time `ts`.
    */
  case class TableUpdate(key: String, ts: Long, value: String)

  /** One stream fact to enrich. */
  case class Fact(key: String, ts: Long, payload: String)

  /** Fact enriched with the table value current at its event time
    * (None = no version yet — KStream⋈KTable's unmatched-left null).
    */
  case class EnrichedFact(key: String, ts: Long, payload: String,
      value: Option[String])

  /** Stream⋈TABLE join where the dimension is itself a LIVE changelog
    * stream — the KStream⋈KTable shape (beyond-reference surface: the
    * reference links kafka-streams but never exercises stream-table joins,
    * SURVEY §2.4 "not present"; Spark has no built-in stream-stream
    * enrichment without a window, so this is the custom-state expression).
    *
    * Semantics are timestamp-synchronized like Kafka Streams: within each
    * micro-batch, updates and facts for a key apply in EVENT-TIME order
    * (updates before facts at equal ts, same tie policy as
    * [[graft.ops.AsOf.asOfJoin]]), so a fact is enriched with the latest
    * update at-or-before its own timestamp even when both arrive in one
    * batch. Across batches the table state is whatever has been ingested —
    * the KS contract (a replayed fact sees the NEWER table, exactly like
    * KS reprocessing). An update older than the key's current state is
    * ignored (history is not versioned — state per key is ONE (ts, value)
    * pair, the 100 TB bound; for point-in-time-correct historical joins
    * use the batch [[graft.ops.AsOf]] over the SCD2 materialization).
    */
  def streamTableJoin(facts: Dataset[Fact],
      updates: Dataset[TableUpdate]): Dataset[EnrichedFact] = {
    implicit val taggedEnc: Encoder[(String, Long, Int, String)] =
      Encoders.tuple(Encoders.STRING, Encoders.scalaLong, Encoders.scalaInt, Encoders.STRING)
    implicit val stateEnc: Encoder[(Long, String)] =
      Encoders.tuple(Encoders.scalaLong, Encoders.STRING)
    implicit val outEnc: Encoder[EnrichedFact] = Encoders.product[EnrichedFact]
    implicit val keyEnc: Encoder[String] = Encoders.STRING
    val tagged = updates.map(u => (u.key, u.ts, 0, u.value))
      .union(facts.map(f => (f.key, f.ts, 1, f.payload)))
    tagged.groupByKey(_._1)
      .flatMapGroupsWithState[(Long, String), EnrichedFact](
        OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        (key: String, rows: Iterator[(String, Long, Int, String)],
            state: GroupState[(Long, String)]) =>
          val ordered = rows.toVector.sortBy(r => (r._2, r._3, r._4))
          val out = Vector.newBuilder[EnrichedFact]
          var cur = state.getOption
          ordered.foreach {
            case (_, ts, 0, v) =>
              if (cur.forall(_._1 <= ts)) cur = Some((ts, v))
            case (_, ts, 1, p) =>
              // the fold position IS the semantics: within the batch the
              // event-time sort means cur holds the latest at-or-before
              // update; across batches cur is the current table (KS replay)
              out += EnrichedFact(key, ts, p, cur.map(_._2))
            case _ => ()
          }
          cur.foreach(state.update)
          out.result().iterator
      }
  }

  /** [[streamTableJoin]] re-expressed on Spark 4's `transformWithState` —
    * the successor arbitrary-state API, kept alongside the
    * flatMapGroupsWithState form so both extension points stay exercised
    * for this operator family (same policy as
    * [[CustomState.emitOnChangeTws]]; StreamTableJoinSpec asserts parity).
    * Requires the RocksDB state store provider (the caller sets
    * `spark.sql.streaming.stateStore.providerClass`; the spec does).
    */
  def streamTableJoinTws(facts: Dataset[Fact],
      updates: Dataset[TableUpdate]): Dataset[EnrichedFact] = {
    import org.apache.spark.sql.streaming.{StatefulProcessor, TimeMode, TimerValues, TTLConfig, ValueState}
    implicit val taggedEnc: Encoder[(String, Long, Int, String)] =
      Encoders.tuple(Encoders.STRING, Encoders.scalaLong, Encoders.scalaInt, Encoders.STRING)
    implicit val stateEnc: Encoder[(Long, String)] =
      Encoders.tuple(Encoders.scalaLong, Encoders.STRING)
    implicit val outEnc: Encoder[EnrichedFact] = Encoders.product[EnrichedFact]
    implicit val keyEnc: Encoder[String] = Encoders.STRING
    class Join extends StatefulProcessor[String, (String, Long, Int, String), EnrichedFact] {
      @transient private var table: ValueState[(Long, String)] = _
      override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
        table = getHandle.getValueState[(Long, String)]("table", stateEnc, TTLConfig.NONE)
      override def handleInputRows(key: String, rows: Iterator[(String, Long, Int, String)],
          timerValues: TimerValues): Iterator[EnrichedFact] = {
        val ordered = rows.toVector.sortBy(r => (r._2, r._3, r._4))
        val out = Vector.newBuilder[EnrichedFact]
        var cur = if (table.exists()) Some(table.get()) else None
        ordered.foreach {
          case (_, ts, 0, v) => if (cur.forall(_._1 <= ts)) cur = Some((ts, v))
          case (_, ts, 1, p) => out += EnrichedFact(key, ts, p, cur.map(_._2))
          case _ => ()
        }
        cur.foreach(table.update)
        out.result().iterator
      }
    }
    val tagged = updates.map(u => (u.key, u.ts, 0, u.value))
      .union(facts.map(f => (f.key, f.ts, 1, f.payload)))
    tagged.groupByKey(_._1)
      .transformWithState(new Join, TimeMode.None(), OutputMode.Update())
  }
}
