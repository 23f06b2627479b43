package graft.ops

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column support: image/audio/video payloads as opaque `binary`
  * columns with a typed metadata struct, plus decode / feature-extract /
  * frame-sample stages as per-partition batch transforms.
  *
  * The DECODE step is a clearly-marked DETERMINISTIC STUB (no image/audio
  * libraries in this environment — the brief says stub the decode, make the
  * Spark-side plumbing real): it derives fake-but-stable features from the
  * payload bytes. Everything around it — the schema convention, the
  * mapPartitions batch shape (one reusable "decoder" per partition, the
  * same shape a JNI/FFI decoder needs), partitioning and row fan-out — is
  * the real production plumbing.
  *
  * Schema convention (the `media` struct):
  *   payload  BINARY      — opaque encoded bytes
  *   mime     STRING      — e.g. image/png, audio/wav, video/mp4
  *   width, height INT    — pixel dims (images/video), null otherwise
  *   duration_ms BIGINT   — audio/video, null otherwise
  */
object Multimodal {

  val mediaSchema: StructType = StructType(Seq(
    StructField("payload", BinaryType),
    StructField("mime", StringType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("duration_ms", LongType)))

  /** Wrap a binary column + mime into the media struct convention. */
  def asMedia(payload: org.apache.spark.sql.Column, mime: String): org.apache.spark.sql.Column =
    struct(payload.as("payload"), lit(mime).as("mime"),
      lit(null).cast("int").as("width"), lit(null).cast("int").as("height"),
      lit(null).cast("long").as("duration_ms"))

  /** STUB decoder: deterministic pseudo-features from payload bytes.
    * Replace the body with a real codec (libjpeg/ffmpeg via FFI) in
    * production; signature and batch shape stay identical.
    */
  private def stubFeatures(payload: Array[Byte], dims: Int): Array[Float] = {
    val out = new Array[Float](dims)
    var h = 2166136261L.toInt // FNV-1a
    var i = 0
    while (i < payload.length) { h = (h ^ (payload(i) & 0xff)) * 16777619; i += 1 }
    var d = 0
    while (d < dims) {
      h = (h ^ d) * 16777619
      out(d) = (h & 0xffff) / 65536.0f
      d += 1
    }
    out
  }

  /** Feature extraction over a media struct column: one decoder per
    * partition (mapPartitions), one feature vector per row. This is the
    * image-embedding stage of a training-data pipeline.
    */
  def extractFeatures(df: DataFrame, idCol: String, mediaCol: String, dims: Int = 16): DataFrame = {
    val idIdx = df.schema.fieldIndex(idCol)
    val mIdx = df.schema.fieldIndex(mediaCol)
    val outSchema = StructType(Seq(
      df.schema(idIdx),
      StructField("features", ArrayType(FloatType, containsNull = false)),
      StructField("n_bytes", LongType)))
    df.mapPartitions { rows =>
      // per-partition decoder init happens HERE in a real codec
      rows.map { row =>
        val media = row.getStruct(mIdx)
        val payload = if (media == null) null else media.getAs[Array[Byte]]("payload")
        // null payload (upstream decode failure) → null features, 0 bytes —
        // a bad record must not kill the job (P13 tolerance)
        if (payload == null) Row(row.get(idIdx), null, 0L)
        else Row(row.get(idIdx), stubFeatures(payload, dims).toSeq, payload.length.toLong)
      }
    }(Encoders.row(outSchema))
  }

  /** Frame sampling for video payloads: 1→N rows, deterministic byte-range
    * chunking as the STUB for real frame extraction. The fan-out shape
    * (explode to (id, frame_idx, frame_payload)) is the real pipeline shape.
    */
  def sampleFrames(df: DataFrame, idCol: String, mediaCol: String, frames: Int = 4): DataFrame = {
    val idIdx = df.schema.fieldIndex(idCol)
    val mIdx = df.schema.fieldIndex(mediaCol)
    val outSchema = StructType(Seq(
      df.schema(idIdx),
      StructField("frame_idx", IntegerType, nullable = false),
      StructField("frame", BinaryType)))
    df.flatMap { row =>
      val media = row.getStruct(mIdx)
      val payload = if (media == null) null else media.getAs[Array[Byte]]("payload")
      if (payload == null) Seq.empty[Row]
      else sampleRows(row.get(idIdx), payload, frames)
    }(Encoders.row(outSchema))
  }

  private def sampleRows(id: Any, payload: Array[Byte], frames: Int): Seq[Row] = {
    val n = math.max(1, math.min(frames, payload.length))
    (0 until n).map { i =>
      val from = payload.length * i / n
      val until = payload.length * (i + 1) / n
      Row(id, i, java.util.Arrays.copyOfRange(payload, from, until))
    }
  }

  /** Metadata-only resize: records the target dims in the media struct
    * (payload untouched by the stub; a real resize re-encodes).
    */
  def resize(df: DataFrame, mediaCol: String, w: Int, h: Int): DataFrame =
    df.withColumn(mediaCol,
      struct(
        col(s"$mediaCol.payload").as("payload"),
        col(s"$mediaCol.mime").as("mime"),
        lit(w).as("width"), lit(h).as("height"),
        col(s"$mediaCol.duration_ms").as("duration_ms")))
}
