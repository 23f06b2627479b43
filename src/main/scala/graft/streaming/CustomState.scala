package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoder, Encoders, Row}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Custom-state streaming operators via `KeyValueGroupedDataset`
  * state APIs — for semantics the built-in aggregates can't express
  * (SURVEY §2.9: arbitrary stateful lambdas are the reference's extension
  * point; Spark's analogue is [flat]mapGroupsWithState).
  */
object CustomState {

  /** Streaming EXACT dedup by key columns — built-in path
    * (`dropDuplicatesWithinWatermark`): state is evicted once the
    * watermark passes, so memory is bounded at 100 TB/day ingest. Use this
    * before custom state whenever it expresses the semantics (SURVEY §7.3
    * preference order).
    */
  def streamingDedup(df: DataFrame, tsCol: String, watermark: String,
      keyCols: Seq[String]): DataFrame =
    df.withWatermark(tsCol, watermark).dropDuplicatesWithinWatermark(keyCols)

  /** Emit-on-change changelog: per key, emit a record only when the
    * observed value DIFFERS from the previous one — the KTable-changelog
    * coalescing the reference toggles with
    * CACHE_MAX_BYTES_BUFFERING_CONFIG (`KafkaWordCount.java:50`), which no
    * built-in aggregate expresses (an update-mode agg re-emits on every
    * batch it participates in). State per key = last seen value.
    *
    * Optional `ttlMs` evicts abandoned keys via processing-time timeouts.
    * CAUTION: with a TTL, Spark schedules continuous timeout-check batches,
    * so `processAllAvailable()` no longer converges — fine for production
    * triggers, unsuitable for drain-style tests (hence the None default).
    */
  def emitOnChange(ds: Dataset[(String, String)],
      ttlMs: Option[Long] = None): Dataset[(String, String)] = {
    implicit val tupleEnc: Encoder[(String, String)] = Encoders.tuple(Encoders.STRING, Encoders.STRING)
    implicit val stringEnc: Encoder[String] = Encoders.STRING
    val timeout = if (ttlMs.isDefined) GroupStateTimeout.ProcessingTimeTimeout()
                  else GroupStateTimeout.NoTimeout()
    ds.groupByKey(_._1)
      .flatMapGroupsWithState[String, (String, String)](OutputMode.Update(), timeout) {
        (key: String, rows: Iterator[(String, String)], state: GroupState[String]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            ttlMs.foreach(state.setTimeoutDuration)
            var prev = state.getOption
            val out = rows.flatMap { case (_, v) =>
              if (!prev.contains(v)) { prev = Some(v); Some(key -> v) } else None
            }.toVector
            prev.foreach(state.update)
            out.iterator
          }
      }
  }

  /** [[emitOnChange]] re-expressed on Spark 4's `transformWithState` — the
    * successor arbitrary-state API (typed state variables, timers, TTL,
    * RocksDB-backed). Semantics are identical (CustomStateSpec asserts
    * parity); kept alongside the flatMapGroupsWithState form so both
    * extension points stay exercised. Requires the RocksDB state store
    * provider (the caller sets
    * `spark.sql.streaming.stateStore.providerClass`; the spec does).
    */
  def emitOnChangeTws(ds: Dataset[(String, String)]): Dataset[(String, String)] = {
    import org.apache.spark.sql.streaming.{StatefulProcessor, TimeMode, TimerValues, TTLConfig, ValueState}
    implicit val tupleEnc: Encoder[(String, String)] = Encoders.tuple(Encoders.STRING, Encoders.STRING)
    implicit val stringEnc: Encoder[String] = Encoders.STRING
    class EmitOnChange extends StatefulProcessor[String, (String, String), (String, String)] {
      @transient private var last: ValueState[String] = _
      override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
        last = getHandle.getValueState[String]("last", Encoders.STRING, TTLConfig.NONE)
      override def handleInputRows(key: String, rows: Iterator[(String, String)],
          timerValues: TimerValues): Iterator[(String, String)] = {
        var prev = if (last.exists()) Some(last.get()) else None
        val out = rows.flatMap { case (_, v) =>
          if (!prev.contains(v)) { prev = Some(v); Some(key -> v) } else None
        }.toVector
        prev.foreach(last.update)
        out.iterator
      }
    }
    ds.groupByKey(_._1)
      .transformWithState(new EmitOnChange, TimeMode.None(), OutputMode.Update())
  }

  /** Streaming golden record: per key, maintain each attribute's value
    * from the highest-priority row that had it non-null — the streaming
    * twin of [[graft.ops.Fuzzy.goldenRecords]], same unique-priority
    * contract — and emit the merged record whenever it changes. Late
    * (lower-priority) rows fill attributes a newer row left null but never
    * overwrite newer values. State per key is one (priority, value) pair
    * per attribute — bounded by attribute count, never by stream length.
    */
  def goldenRecordState(ds: Dataset[(String, Long, Map[String, String])])
      : Dataset[(String, Map[String, String])] = {
    type AttrState = Map[String, (Long, String)]
    import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
    implicit val strEnc: Encoder[String] = Encoders.STRING
    implicit val stateEnc: Encoder[Map[String, (Long, String)]] =
      ExpressionEncoder[Map[String, (Long, String)]]()
    implicit val outEnc: Encoder[(String, Map[String, String])] =
      Encoders.tuple(Encoders.STRING, ExpressionEncoder[Map[String, String]]())
    ds.groupByKey(_._1)
      .flatMapGroupsWithState[AttrState, (String, Map[String, String])](
        OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        (key: String, rows: Iterator[(String, Long, Map[String, String])],
         state: GroupState[AttrState]) =>
          var attrs = state.getOption.getOrElse(Map.empty: AttrState)
          // dirtiness (persist) and emit-worthiness are distinct: a row
          // re-asserting the SAME value at a HIGHER priority must persist
          // the upgraded priority (or a later mid-priority row would wrongly
          // overwrite it next batch), yet emits nothing — the merged record
          // the reader sees is unchanged.
          var valueChanged = false
          var dirty = false
          rows.toSeq.sortBy(_._2).foreach { case (_, pri, row) =>
            row.foreach { case (a, v) =>
              if (v != null && attrs.get(a).forall(_._1 <= pri)) {
                if (!attrs.get(a).map(_._2).contains(v)) valueChanged = true
                if (!attrs.get(a).contains((pri, v))) dirty = true
                attrs = attrs.updated(a, (pri, v))
              }
            }
          }
          if (dirty) state.update(attrs)
          if (valueChanged)
            Iterator.single(key -> attrs.map { case (a, (_, v)) => a -> v })
          else Iterator.empty
      }
  }
}
