package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import graft.ops.Multimodal

/** Streaming MEDIA near-duplicate detection: per-row perceptual hash
  * (a stateless codegen'd projection — a stream row is one complete
  * image/audio payload) → explode the 4 Hamming bands of
  * [[graft.ops.Multimodal.bandedHammingPairs]] → bucket-keyed min-id
  * state. The multimodal twin of [[StreamingLsh.bucketFirstSeen]], with
  * the same output contract:
  *
  * (doc_id, band, bucket_rep) per (doc × band); a doc is a near-dup
  * CANDIDATE iff any row has bucket_rep < doc_id — the streaming form of
  * the batch keeper rule (a shared exact band with a lower id). Band
  * equality is the batch path's candidate generation, so the candidate
  * sets agree exactly; Hamming verification composes downstream where the
  * batch twin applies `bit_count(xor) <= maxHamming`.
  *
  * Determinism: the representative is the MIN id ever seen (not arrival
  * order within a micro-batch). Scale: state is ONE long per occupied
  * (band, value) bucket — at most 4·2^16 entries per modality, hard-capped
  * by the key space itself, so this stream needs no eviction horizon.
  */
object MediaStream {

  /** Shared banded bucket-first-seen over any 63-bit media hash frame
    * (idCol, hashCol LONG, nulls pre-filtered).
    */
  def hashBucketFirstSeen(hashed: DataFrame, idCol: String,
      hashCol: String): Dataset[(Long, Int, Long)] = {
    // The narrow (id, hash) frame is REPARTITIONED before banding — the
    // streaming stand-in for the batch path's materialize boundary, and
    // load-bearing for the same reason: without an exchange here the
    // hash projection (72 gray columns for images) fuses with the
    // banding/explode/state-input code into ONE whole-stage codegen
    // span, the generated processNext() grows past janino's 64 KB, and
    // the ENTIRE span silently falls back to interpreted eval (~200×
    // slower — measured as a stream that never finishes its first
    // micro-batch). The shuffle itself is 16 bytes/row and the state
    // operator shuffles anyway on (band, value) right after.
    val boundary = hashed.select(col(idCol).cast("long").as("doc_id"),
        col(hashCol).as("__hsh"))
      .repartition(col("doc_id"))
    val banded = boundary.select(col("doc_id"), col("__hsh"),
        explode(array((0 until 4).map(lit(_)): _*)).as("band"))
      .withColumn("bval",
        expr("shiftright(__hsh, band * 16)").bitwiseAND(lit(0xFFFFL)))
      .select(col("doc_id"), col("band"), col("bval"))
    import banded.sparkSession.implicits._
    banded.as[(Long, Int, Long)]
      .groupByKey { case (_, band, bval) => (band, bval) }
      .flatMapGroupsWithState[Long, (Long, Int, Long)](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (key: (Int, Long), rows: Iterator[(Long, Int, Long)], state: GroupState[Long]) =>
          val docs = rows.map(_._1).toVector
          val rep = math.min(state.getOption.getOrElse(Long.MaxValue), docs.min)
          state.update(rep)
          docs.iterator.map(d => (d, key._1, rep))
      }
  }

  /** Image stream → dHash → banded min-id state (undecodable payloads
    * pass through no bucket, mirroring the batch null-hash filter).
    */
  def imageBucketFirstSeen(df: DataFrame, idCol: String,
      mediaCol: String): Dataset[(Long, Int, Long)] =
    hashBucketFirstSeen(
      Multimodal.dHash(df, idCol, mediaCol).filter(col("dhash").isNotNull),
      idCol, "dhash")

  /** Audio stream → fingerprint → banded min-id state. */
  def audioBucketFirstSeen(df: DataFrame, idCol: String,
      mediaCol: String): Dataset[(Long, Int, Long)] =
    hashBucketFirstSeen(
      Multimodal.audioFingerprint(df, idCol, mediaCol)
        .filter(col("afp").isNotNull),
      idCol, "afp")
}
