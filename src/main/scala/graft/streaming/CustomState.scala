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

  /** Streaming A-ES weighted sample: per class, maintain the k highest
    * hash-derived priorities — the streaming twin of
    * [[graft.ops.Sampling.weightedPerClass]]. The priority is computed by
    * the IDENTICAL recipe (md5-h32 uniform, `Math.pow(u, 1/w)` — the same
    * function Spark's POWER codegen calls — floored to 1e-6 units, ties
    * score-desc then id-asc like [[graft.functions.TopK]]), so after any
    * prefix of the stream the state equals the batch sample over the same
    * rows — CustomStateSpec asserts the equivalence batch-by-batch.
    *
    * Input rows are (class, id, weight); non-positive weights are excluded
    * (A-ES is undefined there, matching the batch op). Emits the class's
    * FULL membership as (class, version, id, prio_micro) whenever it
    * changes — version is a per-class monotone counter so a consumer (and
    * the spec) can pick each class's latest snapshot. State per class is
    * ≤ k (prio, id) pairs plus the counter — bounded by k, never by
    * stream length.
    */
  def weightedSampleState(ds: Dataset[(String, Long, Double)], k: Int,
      salt: String = "s0"): Dataset[(String, Long, Long, Long)] = {
    require(k > 0, s"k must be positive, got $k")
    // state = (version, (prio, id) pairs sorted desc)
    import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
    implicit val strEnc: Encoder[String] = Encoders.STRING
    implicit val stateEnc: Encoder[(Long, Seq[(Long, Long)])] =
      ExpressionEncoder[(Long, Seq[(Long, Long)])]()
    implicit val outEnc: Encoder[(String, Long, Long, Long)] =
      ExpressionEncoder[(String, Long, Long, Long)]()
    def prioMicro(id: Long, w: Double): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(s"${id}_$salt".getBytes(java.nio.charset.StandardCharsets.UTF_8))
        .take(4).map("%02x".format(_)).mkString
      val u = (java.lang.Long.parseLong(hex, 16) % 1000000L + 0.5) / 1000000.0
      math.floor(math.pow(u, 1.0 / w) * 1000000.0).toLong
    }
    ds.groupByKey(_._1)
      .flatMapGroupsWithState[(Long, Seq[(Long, Long)]), (String, Long, Long, Long)](
        OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        (cls: String, rows: Iterator[(String, Long, Double)],
         state: GroupState[(Long, Seq[(Long, Long)])]) =>
          val (ver, cur) = state.getOption.getOrElse((0L, Seq.empty[(Long, Long)]))
          val cand = (cur ++ rows.filter(_._3 > 0).map { case (_, id, w) =>
            (prioMicro(id, w), id)
          }).distinct
          val top = cand.sortBy { case (p, id) => (-p, id) }.take(k)
          if (top == cur) Iterator.empty
          else {
            state.update((ver + 1, top))
            top.iterator.map { case (p, id) => (cls, ver + 1, id, p) }
          }
      }
  }

  /** Streaming token-budget admission gate: per class, admit arriving docs
    * while the class's running token total stays within `budget`; a
    * class's FIRST doc is always admitted (the batch op's
    * never-empty-a-class contract). Within a micro-batch, rows are ordered
    * by the SAME md5-hash order [[graft.ops.Sampling.tokenBudgetPerClass]]
    * uses, so (a) a replay of the same batches admits the same docs, and
    * (b) when everything arrives in ONE batch the admitted set equals the
    * batch op's exactly (CustomStateSpec asserts it). Across batches,
    * admission is arrival-ordered — an admission gate cannot retroactively
    * prefer a later doc; that cross-batch divergence from the batch op is
    * the documented semantic, not a bug. State per class is two longs
    * (admitted count, running total).
    */
  def tokenBudgetState(ds: Dataset[(String, Long, Long)], budget: Long,
      salt: String = "s0"): Dataset[(String, Long, Long, Long)] = {
    require(budget > 0, s"budget must be positive, got $budget")
    import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
    implicit val strEnc: Encoder[String] = Encoders.STRING
    implicit val stateEnc: Encoder[(Long, Long)] = Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong)
    implicit val outEnc: Encoder[(String, Long, Long, Long)] =
      ExpressionEncoder[(String, Long, Long, Long)]()
    def h(id: Long): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(s"${id}_$salt".getBytes(java.nio.charset.StandardCharsets.UTF_8))
        .take(4).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex, 16)
    }
    ds.groupByKey(_._1)
      .flatMapGroupsWithState[(Long, Long), (String, Long, Long, Long)](
        OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        (cls: String, rows: Iterator[(String, Long, Long)],
         state: GroupState[(Long, Long)]) =>
          var (n, total) = state.getOption.getOrElse((0L, 0L))
          val admitted = rows.toSeq.sortBy { case (_, id, _) => (h(id), id) }
            .flatMap { case (_, id, tok) =>
              if (n == 0L || total + tok <= budget) {
                n += 1; total += tok
                Some((cls, id, tok, total))
              } else None
            }
          if (admitted.nonEmpty) state.update((n, total))
          admitted.iterator
      }
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
