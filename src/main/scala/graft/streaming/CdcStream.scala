package graft.streaming

import org.apache.spark.sql.{Dataset, Encoder, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming SCD2 (slowly-changing-dimension type 2) materialization — the
  * continuous twin of [[graft.ops.Cdc.scd2]]: an append-only per-key change
  * stream becomes validity intervals `[valid_from, valid_to)` with an
  * `is_current` flag, maintained incrementally.
  *
  * Contract (the repo's streaming-twin standard): FINAL-STATE equivalence —
  * the latest emission per (key, valid_from, tie) equals the batch
  * `Cdc.scd2` over the same (non-late) changes. A version is emitted up to
  * twice: once OPEN (`valid_to = None, is_current = true`) in the batch
  * that observes it, and once CLOSED when its successor arrives; update
  * mode makes the second emission supersede the first downstream.
  *
  * State per key is ONE row — the open version's (ts, tie, value) — so
  * state size is |keys|, not |changes|: the 100 TB/day ingest bound. The
  * price is a late-data rule: a change older than the key's open version
  * (by (ts, tie) order) cannot splice an interval into already-emitted
  * history and is DROPPED — the same discard a watermark would impose,
  * made explicit here because interval re-writes can't be retracted
  * downstream. Batch rows for a key are applied in (ts, tie) order, so
  * out-of-order arrivals WITHIN a batch still produce exact intervals.
  */
object CdcStream {

  /** One change record: key, event-time, per-key unique tiebreaker
    * (offset / event id), value payload.
    */
  case class Scd2Change(key: String, ts: Long, tie: Long, value: String)

  /** One dimension version; `valid_to = None` means open/current. */
  case class Scd2Version(key: String, valid_from: Long, tie: Long,
      value: String, valid_to: Option[Long], is_current: Boolean)

  def scd2State(ds: Dataset[Scd2Change]): Dataset[Scd2Version] = {
    implicit val changeEnc: Encoder[Scd2Change] = Encoders.product[Scd2Change]
    implicit val versionEnc: Encoder[Scd2Version] = Encoders.product[Scd2Version]
    implicit val stateEnc: Encoder[(Long, Long, String)] =
      Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong, Encoders.STRING)
    implicit val keyEnc: Encoder[String] = Encoders.STRING
    ds.groupByKey(_.key)
      .flatMapGroupsWithState[(Long, Long, String), Scd2Version](
        OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        (key: String, rows: Iterator[Scd2Change], state: GroupState[(Long, Long, String)]) =>
          val ordered = rows.toVector.sortBy(c => (c.ts, c.tie))
          var open = state.getOption
          val out = Vector.newBuilder[Scd2Version]
          var openChanged = false
          ordered.foreach { c =>
            open match {
              // late: at-or-before the open version in (ts, tie) order —
              // emitted history can't be spliced; drop (see scaladoc)
              case Some((ts, tie, _)) if c.ts < ts || (c.ts == ts && c.tie <= tie) => ()
              case Some((ts, tie, v)) =>
                out += Scd2Version(key, ts, tie, v, Some(c.ts), is_current = false)
                open = Some((c.ts, c.tie, c.value))
                openChanged = true
              case None =>
                open = Some((c.ts, c.tie, c.value))
                openChanged = true
            }
          }
          if (openChanged) {
            open.foreach { case (ts, tie, v) =>
              out += Scd2Version(key, ts, tie, v, None, is_current = true)
              state.update((ts, tie, v))
            }
          }
          out.result().iterator
      }
  }
}
