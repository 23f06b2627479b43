package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, Encoder, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming twins of [[graft.ops.TimeSeries]]'s regularization operators
  * (the last §2.5-adjacent family without streaming counterparts):
  * gap-sessionization and resample/forward-fill as watermark-driven
  * stateful streams.
  *
  * Both ride `flatMapGroupsWithState` with EVENT-TIME timeouts, because the
  * built-ins can't express them: `session_window` aggregates per session
  * (W3) but cannot tag each EVENT with its per-key session ordinal, and no
  * built-in emits grid rows for buckets that received no input. Emission is
  * strictly watermark-final — a row is produced only when no in-watermark
  * arrival can change it — so the drained stream equals the batch operator
  * on the same input (TimeSeriesStreamSpec asserts exactly that).
  *
  * Scale/state story (the 100 TB question for any custom state):
  *  - sessionize buffers one key's CURRENT OPEN session tail, evicted the
  *    moment the watermark passes its gap — state is O(events within one
  *    gap window per key), the same bound `session_window` itself carries;
  *  - resampleFill keeps the per-bucket survivor (not raw events) for
  *    not-yet-final buckets plus one carry value — O(watermark delay /
  *    step) per key, a knob, with the carry making long-silent keys O(1)
  *    rather than resurrecting history.
  */
object TimeSeriesStream {

  /** One keyed observation; `ord` breaks exact-timestamp ties exactly as in
    * the batch operator.
    */
  case class TsEvent(key: Long, ts: Timestamp, ord: Long, value: Double)

  case class SessionOut(key: Long, ord: Long, session_id: Long)

  case class FillOut(key: Long, bucket: Long, filled: Double, observed: Boolean)

  case class AnomalyOut(key: Long, ord: Long, anomaly: Boolean, hist_n: Long)

  // State case classes hold PRIMITIVE ARRAYS and must be PUBLIC: the
  // state-store serializer codegen (Janino) refuses to invoke accessors on
  // a non-public class ("no applicable method" with the method itself
  // listed as candidate), and flat arrays also serialize tighter than
  // Seq[Tuple]/Map shapes. Internal API — not part of the operator surface.
  case class SessState(bufTs: Array[Long], bufOrd: Array[Long], nextSession: Long)

  case class AnomState(
      pTs: Array[Long], pOrd: Array[Long], pX: Array[Long], // pending (unordered)
      tail: Array[Long]) // last `width` FINALIZED quantized values, oldest first

  case class FillState(
      pBucket: Array[Long],   // pending buckets (parallel arrays:
      pTs: Array[Long],       //   per-bucket max-(ts, ord, v) survivor)
      pOrd: Array[Long],
      pVal: Array[Double],
      hasLast: Boolean, lastVal: Double, // carry for forward fill
      hasNext: Boolean, nextBucket: Long, // next grid bucket to emit
      maxBucket: Long)        // grid end seen so far

  private def us(t: Timestamp): Long = t.getTime * 1000L + (t.getNanos / 1000) % 1000

  /** Streaming [[graft.ops.TimeSeries.sessionize]]: every event tagged with
    * its 0-based per-key session id (new session when the gap since the
    * key's previous event exceeds `gapUs`).
    *
    * The event-time timeout IS the session-close proof: it fires only once
    * the watermark passes `lastTs + gap`, and any later non-late arrival
    * has `ts ≥ watermark > lastTs + gap` — i.e. it starts a NEW session —
    * so the buffered tail can be emitted final and dropped. Session ids
    * continue across emissions via one counter; buffered events sort by
    * (ts, ord) at emission, so in-watermark disorder is tolerated.
    */
  def sessionize(ds: Dataset[TsEvent], gapUs: Long, watermark: String): Dataset[SessionOut] = {
    require(gapUs > 0, s"gapUs must be positive, got $gapUs")
    implicit val outEnc: Encoder[SessionOut] = Encoders.product[SessionOut]
    implicit val stEnc: Encoder[SessState] = Encoders.product[SessState]
    implicit val keyEnc: Encoder[Long] = Encoders.scalaLong
    ds.withWatermark("ts", watermark)
      .groupByKey(_.key)
      .flatMapGroupsWithState[SessState, SessionOut](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (key: Long, rows: Iterator[TsEvent], state: GroupState[SessState]) =>
          val st = state.getOption.getOrElse(SessState(Array.empty, Array.empty, 0L))
          if (state.hasTimedOut) {
            // watermark passed lastTs+gap: the buffered tail is a closed
            // run of sessions — assign ids and release the state
            val sorted = (st.bufTs zip st.bufOrd).sortBy(identity)
            var sid = st.nextSession - 1
            var prev = Long.MinValue
            val out = sorted.map { case (ts, ord) =>
              if (prev == Long.MinValue || ts - prev > gapUs) sid += 1
              prev = ts
              SessionOut(key, ord, sid)
            }
            if (out.nonEmpty) state.update(SessState(Array.empty, Array.empty, sid + 1))
            else state.remove()
            out.iterator
          } else {
            val add = rows.map(e => (us(e.ts), e.ord)).toArray
            val bufTs = st.bufTs ++ add.map(_._1)
            val bufOrd = st.bufOrd ++ add.map(_._2)
            state.update(SessState(bufTs, bufOrd, st.nextSession))
            if (bufTs.nonEmpty) {
              val lastMs = bufTs.max / 1000L
              // must exceed the current watermark or Spark rejects it —
              // in-watermark data always satisfies this, late data may not
              state.setTimeoutTimestamp(
                math.max(lastMs + gapUs / 1000L + 1L, state.getCurrentWatermarkMs + 1L))
            }
            Iterator.empty
          }
      }
  }

  /** Streaming [[graft.ops.TimeSeries.rollingAnomalies]]: every event tagged
    * with the exact-integer trailing z-score flag (same cent quantization,
    * same denominator-cleared inequality, same (ts, ord) order) as the
    * watermark finalizes it.
    *
    * Finality: an event's trailing frame is fixed once no arrival can sort
    * before it — i.e. once the watermark passes its timestamp STRICTLY (an
    * in-watermark arrival with an equal ts could still precede it by ord).
    * Pending events buffer unordered and sort at drain; the only long-lived
    * state is the `width`-value finalized tail each future frame needs, so
    * steady-state state is O(width + in-flight watermark window) per key.
    */
  def rollingAnomalies(ds: Dataset[TsEvent], width: Int, k: Int,
      watermark: String): Dataset[AnomalyOut] = {
    require(width > 0 && width <= 64, s"width must be in [1,64], got $width")
    require(k > 0, s"k must be positive, got $k")
    implicit val outEnc: Encoder[AnomalyOut] = Encoders.product[AnomalyOut]
    implicit val stEnc: Encoder[AnomState] = Encoders.product[AnomState]
    implicit val keyEnc: Encoder[Long] = Encoders.scalaLong
    ds.withWatermark("ts", watermark)
      .groupByKey(_.key)
      .flatMapGroupsWithState[AnomState, AnomalyOut](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (key: Long, rows: Iterator[TsEvent], state: GroupState[AnomState]) =>
          val st = state.getOption.getOrElse(
            AnomState(Array.empty, Array.empty, Array.empty, Array.empty))
          // same quantization op as the batch operator's floor(v*100) column
          val added = rows.map(e => (us(e.ts), e.ord,
            math.floor(e.value * 100).toLong)).toArray
          val pend = (st.pTs.indices.map(i => (st.pTs(i), st.pOrd(i), st.pX(i)))
            ++ added).sortBy(t => (t._1, t._2)).toArray
          val wmUs = state.getCurrentWatermarkMs * 1000L
          val (fin, rest) = pend.partition(_._1 < wmUs)
          var tail = st.tail
          val out = fin.map { case (_, ord, x) =>
            val flag = tail.length == width && {
              val s = tail.sum
              val s2 = tail.map(v => v * v).sum
              val lhs = width * x - s
              lhs * lhs > k.toLong * k * (width * s2 - s * s)
            }
            val n = tail.length.toLong
            tail = (tail :+ x).takeRight(width)
            AnomalyOut(key, ord, flag, n)
          }
          state.update(AnomState(rest.map(_._1), rest.map(_._2), rest.map(_._3), tail))
          if (rest.nonEmpty)
            // wake when the oldest pending event finalizes, even if the key
            // never sees another row
            state.setTimeoutTimestamp(math.max(rest.map(_._1).min / 1000L + 1L,
              state.getCurrentWatermarkMs + 1L))
          out.iterator
      }
  }

  case class EwmaOut(key: Long, bucket: Long, ewma_cents: Long)

  /** Streaming [[graft.ops.TimeSeries.ewma]]: each observation tagged with
    * the width-bounded integer-weight EWMA of its trailing frame (same
    * cent quantization, same decayNum/decayDen weight table, same
    * truncating division) as the watermark finalizes it. Input is the
    * already-regular observation stream (one event per key per `stepUs`
    * bucket — the resampleFill contract); bucket = epoch-µs div stepUs.
    *
    * Finality and state mirror [[rollingAnomalies]] exactly: pending
    * events buffer unordered until the watermark passes them strictly,
    * then sort and fold; the long-lived state is the (width−1)-value
    * finalized tail the next frame needs. Drained output ≡ the batch
    * operator on the same rows (TimeSeriesStreamSpec pins it).
    */
  def ewma(ds: Dataset[TsEvent], stepUs: Long, width: Int, decayNum: Int,
      decayDen: Int, watermark: String): Dataset[EwmaOut] = {
    require(stepUs > 0, s"stepUs must be positive, got $stepUs")
    require(width > 0 && width <= 64, s"width must be in [1,64], got $width")
    require(decayNum > 0 && decayDen > decayNum,
      s"decay must be a rational in (0,1), got $decayNum/$decayDen")
    require(BigInt(decayDen).pow(width - 1) < (BigInt(1) << 31),
      s"decayDen^(width-1) overflows the long weight budget")
    val weights = (0 until width)
      .map(l => (BigInt(decayNum).pow(l) * BigInt(decayDen).pow(width - 1 - l)).toLong)
      .toArray
    implicit val outEnc: Encoder[EwmaOut] = Encoders.product[EwmaOut]
    implicit val stEnc: Encoder[AnomState] = Encoders.product[AnomState]
    implicit val keyEnc: Encoder[Long] = Encoders.scalaLong
    ds.withWatermark("ts", watermark)
      .groupByKey(_.key)
      .flatMapGroupsWithState[AnomState, EwmaOut](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (key: Long, rows: Iterator[TsEvent], state: GroupState[AnomState]) =>
          val st = state.getOption.getOrElse(
            AnomState(Array.empty, Array.empty, Array.empty, Array.empty))
          val added = rows
            .map(e => (us(e.ts), e.ord, math.floor(e.value * 100).toLong)).toArray
          val pend = (st.pTs.indices.map(i => (st.pTs(i), st.pOrd(i), st.pX(i)))
            ++ added).sortBy(t => (t._1, t._2)).toArray
          val wmUs = state.getCurrentWatermarkMs * 1000L
          val (fin, rest) = pend.partition(_._1 < wmUs)
          var tail = st.tail
          val out = fin.map { case (tsUs, _, x) =>
            val frame = (tail :+ x).takeRight(width)
            var num = 0L; var den = 0L
            frame.indices.foreach { i =>
              val w = weights(frame.length - 1 - i); num += w * frame(i); den += w
            }
            tail = frame.takeRight(width - 1)
            EwmaOut(key, tsUs / stepUs, num / den)
          }
          state.update(AnomState(rest.map(_._1), rest.map(_._2), rest.map(_._3), tail))
          if (rest.nonEmpty)
            state.setTimeoutTimestamp(math.max(rest.map(_._1).min / 1000L + 1L,
              state.getCurrentWatermarkMs + 1L))
          out.iterator
      }
  }

  /** Streaming [[graft.ops.TimeSeries.resampleFill]]: one row per key per
    * `stepUs` bucket between the key's first and last observation, with
    * `filled` forward-carrying the last observed value, emitted as the
    * watermark finalizes each bucket. Buckets between two observations that
    * were silent at finalization time are emitted the moment a LATER event
    * extends the key's grid past them (they are already final then), which
    * is what makes the drained output equal the batch grid.
    */
  def resampleFill(ds: Dataset[TsEvent], stepUs: Long, watermark: String): Dataset[FillOut] = {
    require(stepUs > 0, s"stepUs must be positive, got $stepUs")
    implicit val outEnc: Encoder[FillOut] = Encoders.product[FillOut]
    implicit val stEnc: Encoder[FillState] = Encoders.product[FillState]
    implicit val keyEnc: Encoder[Long] = Encoders.scalaLong

    // the flat-array state round-trips through a Map for the merge/drain
    // logic; the store only ever sees the primitive-array form
    def pendingOf(st: FillState): Map[Long, (Long, Long, Double)] =
      st.pBucket.indices.map(i => st.pBucket(i) -> (st.pTs(i), st.pOrd(i), st.pVal(i))).toMap
    def pack(pending: Map[Long, (Long, Long, Double)], carry: Option[Double],
        next: Option[Long], maxB: Long): FillState = {
      val ks = pending.keys.toArray.sorted
      FillState(ks, ks.map(k => pending(k)._1), ks.map(k => pending(k)._2),
        ks.map(k => pending(k)._3),
        carry.isDefined, carry.getOrElse(0.0), next.isDefined, next.getOrElse(0L), maxB)
    }

    def drain(key: Long, pending0: Map[Long, (Long, Long, Double)], st: FillState,
        wmUs: Long): (FillState, List[FillOut]) = {
      // bucket b is final once the watermark passes its END: (b+1)·step ≤ wm
      val finalB = Math.floorDiv(wmUs, stepUs) - 1L
      val next0 = if (st.hasNext) Some(st.nextBucket)
        else if (pending0.nonEmpty) Some(pending0.keys.min) else None
      next0 match {
        case None => (pack(pending0, None, None, st.maxBucket), Nil)
        case Some(start) =>
          var next = start
          var carry = if (st.hasLast) Some(st.lastVal) else None
          var pending = pending0
          val out = List.newBuilder[FillOut]
          while (next <= finalB && next <= st.maxBucket) {
            val obs = pending.get(next)
            obs.foreach { case (_, _, v) => carry = Some(v) }
            pending -= next
            // carry is always defined: the grid starts at the key's own
            // first OBSERVED bucket, same invariant as the batch operator
            out += FillOut(key, next, carry.get, obs.isDefined)
            next += 1
          }
          (pack(pending, carry, Some(next), st.maxBucket), out.result())
      }
    }

    ds.withWatermark("ts", watermark)
      .groupByKey(_.key)
      .flatMapGroupsWithState[FillState, FillOut](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (key: Long, rows: Iterator[TsEvent], state: GroupState[FillState]) =>
          val st0 = state.getOption.getOrElse(
            pack(Map.empty, None, None, Long.MinValue))
          val wmUs = state.getCurrentWatermarkMs * 1000L
          var pending = pendingOf(st0)
          var maxB = st0.maxBucket
          if (!state.hasTimedOut) rows.foreach { e =>
            val b = Math.floorDiv(us(e.ts), stepUs)
            val cand = (us(e.ts), e.ord, e.value)
            val best = pending.get(b) match {
              case Some(cur) if Ordering[(Long, Long, Double)].gteq(cur, cand) => cur
              case _ => cand
            }
            pending += (b -> best)
            maxB = math.max(maxB, b)
          }
          val (st1, out) = drain(key, pending, st0.copy(maxBucket = maxB), wmUs)
          state.update(st1)
          if (!st1.hasNext || st1.nextBucket <= st1.maxBucket) {
            // wake when the grid end finalizes so the tail drains without
            // needing another event on this key
            val gridEndMs = ((st1.maxBucket + 1L) * stepUs) / 1000L
            state.setTimeoutTimestamp(math.max(gridEndMs + 1L, state.getCurrentWatermarkMs + 1L))
          }
          out.iterator
      }
  }
}
