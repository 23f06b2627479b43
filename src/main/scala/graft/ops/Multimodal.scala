package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Encoders, Row}
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

  // ---- Real header decode (BMP / WAV / PNG need no codec library) ----
  //
  // Pixel/sample DECODE below stays a stub; header METADATA extraction is
  // real: these formats carry dims/rate in fixed-offset header fields, so
  // width/height/sample-rate parse with plain byte arithmetic — expressed
  // as codegen'd column functions (hex slicing + conv), never a UDF.

  /** Little-endian uint from `len` bytes at 0-based `offset` (hex-pair
    * reversal, then base-16 conv).
    */
  private def leUint(bin: Column, offset: Int, len: Int): Column = {
    val h = hex(substring(bin, offset + 1, len))
    val swapped = concat((len to 1 by -1).map(i => substring(h, i * 2 - 1, 2)): _*)
    conv(swapped, 16, 10).cast("long")
  }

  private def beUint(bin: Column, offset: Int, len: Int): Column =
    conv(hex(substring(bin, offset + 1, len)), 16, 10).cast("long")

  /** BMP dims are signed int32 (a negative height means a top-down
    * bitmap); shared two's-complement reinterpretation.
    */
  private def signed32(c: Column): Column = graft.functions.Bits.signed32(c)

  private def magic(bin: Column, offset: Int, hexDigits: String): Column =
    hex(substring(bin, offset + 1, hexDigits.length / 2)) === hexDigits

  private val BmpMagic = "424D" // "BM"
  private val RiffMagic = "52494646" // "RIFF"
  private val WaveMagic = "57415645" // "WAVE"
  private val PngSig = "89504E470D0A1A0A"
  private val AviMagic = "41564920" // "AVI "
  private val ListMagic = "4C495354" // "LIST"
  private val HdrlMagic = "6864726C" // "hdrl"
  private val AvihMagic = "61766968" // "avih"
  private val MoviMagic = "6D6F7669" // "movi"
  private val DbMagic = "30306462" // "00db" (uncompressed DIB frame)

  /** Sniff + parse the header of a BMP / canonical WAV / PNG payload into
    * (fmt, width, height, sample_rate, channels, bits_per_sample,
    * duration_ms); unrecognized or truncated payloads give fmt = null and
    * all-null fields (bad-record tolerance — never an exception).
    *
    * Every fixed-offset field is gated on the chunk that owns it actually
    * being there: WAV audio params require the canonical `fmt ` chunk at
    * offset 12 (a valid WAV leading with JUNK/LIST would otherwise parse
    * chunk bytes as channel counts), BMP dims require BITMAPINFOHEADER
    * (biSize 40 — a BITMAPCOREHEADER stores 16-bit dims at other offsets),
    * and WAV duration additionally requires the canonical `data` chunk.
    * Non-canonical layouts keep fmt and get null fields, never wrong ones.
    */
  def headerMeta(payload: Column): Column = {
    val isBmp = length(payload) >= 26 && magic(payload, 0, BmpMagic)
    val isWav = length(payload) >= 36 && magic(payload, 0, RiffMagic) &&
      magic(payload, 8, WaveMagic)
    val isPng = length(payload) >= 24 && magic(payload, 0, PngSig)
    val isAvi = length(payload) >= 72 && magic(payload, 0, RiffMagic) &&
      magic(payload, 8, AviMagic)
    // field gates: the owning chunk/header variant must be present
    val bmpInfoDims = isBmp && leUint(payload, 14, 4) === 40
    val wavFmt = isWav && magic(payload, 12, "666D7420") && // "fmt "
      leUint(payload, 16, 4) >= 16 // PCM fmt body covers offsets 22..35
    // AVI main header: canonical LIST hdrl leading with avih, whose 56-byte
    // body owns µsPerFrame/totalFrames/width/height at fixed offsets
    val aviHdr = isAvi && magic(payload, 12, ListMagic) &&
      magic(payload, 20, HdrlMagic) && magic(payload, 24, AvihMagic) &&
      leUint(payload, 28, 4) >= 56
    val nullL = lit(null).cast("long")
    val wavDuration = when(length(payload) >= 44 && magic(payload, 36, "64617461") &&
        leUint(payload, 28, 4) > 0, // "data" chunk where canonical + byte rate sane
      floor(leUint(payload, 40, 4).cast("double") * 1000.0 /
        leUint(payload, 28, 4).cast("double")).cast("long"))
    // totalFrames · µsPerFrame via double (each can be 2^32; the Long
    // product would ANSI-overflow on garbage), floored to ms
    val aviDuration = when(leUint(payload, 32, 4) > 0,
      floor(leUint(payload, 48, 4).cast("double") *
        leUint(payload, 32, 4).cast("double") / 1000.0).cast("long"))
    struct(
      when(isBmp, "bmp").when(isWav, "wav").when(isPng, "png")
        .when(isAvi, "avi").as("fmt"),
      when(bmpInfoDims, signed32(leUint(payload, 18, 4)))
        .when(isPng, beUint(payload, 16, 4))
        .when(aviHdr, leUint(payload, 64, 4)).otherwise(nullL).as("width"),
      when(bmpInfoDims, signed32(leUint(payload, 22, 4)))
        .when(isPng, beUint(payload, 20, 4))
        .when(aviHdr, leUint(payload, 68, 4)).otherwise(nullL).as("height"),
      when(wavFmt, leUint(payload, 24, 4)).otherwise(nullL).as("sample_rate"),
      when(wavFmt, leUint(payload, 22, 2)).otherwise(nullL).as("channels"),
      when(wavFmt, leUint(payload, 34, 2)).otherwise(nullL).as("bits_per_sample"),
      when(wavFmt, wavDuration).when(aviHdr, aviDuration)
        .otherwise(nullL).as("duration_ms"))
  }

  /** Fill the media struct's metadata fields from the REAL header parse
    * (payload untouched) — the production metadata-extraction stage.
    */
  def withHeaderMeta(df: DataFrame, mediaCol: String): DataFrame = {
    val m = headerMeta(col(s"$mediaCol.payload"))
    df.withColumn(mediaCol, struct(
      col(s"$mediaCol.payload").as("payload"),
      col(s"$mediaCol.mime").as("mime"),
      m.getField("width").cast("int").as("width"),
      m.getField("height").cast("int").as("height"),
      m.getField("duration_ms").as("duration_ms")))
  }

  // ---- Header synthesizers (fixtures + oracle rows; also handy to write
  // valid container headers around stub-encoded payloads) ----

  private def hexLE(c: Column, len: Int): Column = {
    val h = lpad(hex(c.cast("long")), len * 2, "0")
    concat((len to 1 by -1).map(i => substring(h, i * 2 - 1, 2)): _*)
  }

  private def hexBE(c: Column, len: Int): Column = lpad(hex(c.cast("long")), len * 2, "0")

  /** Header-only (no pixel array) BITMAPINFOHEADER BMP. */
  def bmpPayload(width: Column, height: Column): Column =
    unhex(concat(
      lit(BmpMagic), hexLE(lit(54L), 4), lit("00000000"), hexLE(lit(54L), 4),
      hexLE(lit(40L), 4), hexLE(width, 4), hexLE(height, 4),
      hexLE(lit(1L), 2), hexLE(lit(24L), 2), lit("0" * 48)))

  /** Canonical 44-byte WAV header with an empty data chunk. */
  def wavPayload(sampleRate: Column, channels: Column, bitsPerSample: Column): Column = {
    val blockAlign = channels * bitsPerSample / 8
    unhex(concat(
      lit(RiffMagic), hexLE(lit(36L), 4), lit(WaveMagic),
      lit("666D7420"), hexLE(lit(16L), 4), hexLE(lit(1L), 2),
      hexLE(channels, 2), hexLE(sampleRate, 4),
      hexLE(sampleRate * blockAlign, 4), hexLE(blockAlign, 2),
      hexLE(bitsPerSample, 2), lit("64617461"), hexLE(lit(0L), 4)))
  }

  /** PNG signature + IHDR (8-bit truecolor; CRC zeroed — parsers of the
    * fixed-offset fields don't verify it).
    */
  def pngPayload(width: Column, height: Column): Column =
    unhex(concat(
      lit(PngSig), hexBE(lit(13L), 4), lit("49484452"),
      hexBE(width, 4), hexBE(height, 4),
      lit("0802000000"), lit("00000000")))

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

  /** REAL audio windowing for canonical PCM WAV payloads — no codec, no
    * stub: for uncompressed PCM, window boundaries ARE byte offsets
    * (byteRate and blockAlign from the real header), so splitting an
    * audio column into fixed-duration training windows is pure codegen'd
    * column arithmetic + payload slicing. The ASR/audio-embedding prep
    * stage, fully real in this environment.
    *
    * Windows are blockAlign-aligned (a window must not split a sample
    * frame), sized ⌊byteRate·windowMs/1000⌋ rounded DOWN to alignment
    * (min one frame); the last window carries the remainder. Non-WAV /
    * non-canonical / empty-data payloads emit no rows (same bad-record
    * tolerance as [[sampleFrames]] — never an exception).
    *
    * Output: (idCol, window_idx, start_ms, n_bytes, samples BINARY).
    */
  def audioWindows(df: DataFrame, idCol: String, mediaCol: String,
      windowMs: Int = 1000): DataFrame = {
    require(windowMs > 0, s"windowMs must be positive, got $windowMs")
    // exact integer division for positive operands; products stay < 2^53
    // (byteRate < 2^32, windowMs ≤ 10^5), so the double round-trip is exact
    def idiv(a: Column, b: Column): Column =
      floor(a.cast("double") / b.cast("double")).cast("long")
    val p = col(s"$mediaCol.payload")
    val canonical = length(p) >= 45 && magic(p, 0, RiffMagic) &&
      magic(p, 8, WaveMagic) && magic(p, 12, "666D7420") &&
      magic(p, 36, "64617461") && leUint(p, 28, 4) > 0 && leUint(p, 32, 2) > 0
    val staged = df
      .withColumn("__br", leUint(p, 28, 4))
      .withColumn("__ba", leUint(p, 32, 2))
      .withColumn("__dl", least(leUint(p, 40, 4), length(p).cast("long") - 44L))
      .withColumn("__ok", canonical && col("__dl") > 0)
      .withColumn("__wb", when(col("__ok"), greatest(col("__ba"),
        idiv(idiv(col("__br") * lit(windowMs.toLong), lit(1000L)), col("__ba"))
          * col("__ba"))))
      .withColumn("__n", when(col("__ok"),
        ceil(col("__dl").cast("double") / col("__wb").cast("double")).cast("long")))
    staged
      .withColumn("window_idx",
        explode(when(col("__ok"), sequence(lit(0L), col("__n") - 1L))
          .otherwise(typedLit(Array.empty[Long]))))
      .select(col(idCol), col("window_idx"),
        idiv(col("window_idx") * col("__wb") * 1000L, col("__br")).as("start_ms"),
        least(col("__wb"), col("__dl") - col("window_idx") * col("__wb")).as("n_bytes"),
        p.substr((lit(45L) + col("window_idx") * col("__wb")).cast("int"),
          least(col("__wb"), col("__dl") - col("window_idx") * col("__wb")).cast("int"))
          .as("samples"))
  }

  /** [[wavPayload]] with an actual PCM data chunk — fixture/synthesizer
    * for [[audioWindows]] and any consumer needing real sample bytes.
    */
  def wavPayloadWithData(sampleRate: Column, channels: Column,
      bitsPerSample: Column, data: Column): Column = {
    val blockAlign = channels * bitsPerSample / 8
    unhex(concat(
      lit(RiffMagic), hexLE(lit(36L) + length(data), 4), lit(WaveMagic),
      lit("666D7420"), hexLE(lit(16L), 4), hexLE(lit(1L), 2),
      hexLE(channels, 2), hexLE(sampleRate, 4),
      hexLE(sampleRate * blockAlign, 4), hexLE(blockAlign, 2),
      hexLE(bitsPerSample, 2), lit("64617461"), hexLE(length(data), 4),
      hex(data)))
  }

  /** REAL image row-band tiling for 24-bit BITMAPINFOHEADER BMP payloads
    * — the image analog of [[audioWindows]], and equally codec-free:
    * uncompressed BMP stores pixel rows contiguously at 4-byte-aligned
    * stride rowSize = ⌈3w/4⌉·4, so splitting an image into horizontal
    * bands (the vision-pipeline tiling/patching prep) is header
    * arithmetic + payload slicing in codegen'd columns.
    *
    * Bands are emitted in STORAGE order (bottom-up for the positive
    * heights this handles; `row0` is the storage row index); the last
    * band carries the remainder rows. Non-BMP / non-24bpp / top-down /
    * truncated payloads emit no rows — never an exception.
    *
    * Output: (idCol, band_idx, row0, n_rows, band BINARY).
    */
  def imageBands(df: DataFrame, idCol: String, mediaCol: String,
      bandRows: Int = 16): DataFrame = {
    require(bandRows > 0, s"bandRows must be positive, got $bandRows")
    val p = col(s"$mediaCol.payload")
    val isBmp24 = length(p) >= 54 && magic(p, 0, BmpMagic) &&
      leUint(p, 14, 4) === 40 && leUint(p, 28, 2) === 24
    val w = signed32(leUint(p, 18, 4))
    val h = signed32(leUint(p, 22, 4))
    val off = leUint(p, 10, 4)
    // 24 bpp rows pad to 4-byte alignment
    val rowSize = floor((w * 3 + 3).cast("double") / 4.0).cast("long") * 4L
    val staged = df
      .withColumn("__off", off)
      .withColumn("__rs", rowSize)
      .withColumn("__h", h)
      // division, not `off + rowSize * h`: the product overflows Long for
      // garbage headers carrying huge dims and would validate a truncated
      // payload (same overflow-safe guard as [[dHash]])
      .withColumn("__ok", isBmp24 && w > 0 && h > 0 &&
        floor((length(p).cast("long") - off).cast("double") /
          rowSize.cast("double")).cast("long") >= h)
      .withColumn("__nb", when(col("__ok"),
        ceil(col("__h").cast("double") / bandRows.toDouble).cast("long")))
    staged
      .withColumn("band_idx",
        explode(when(col("__ok"), sequence(lit(0L), col("__nb") - 1L))
          .otherwise(typedLit(Array.empty[Long]))))
      .withColumn("row0", col("band_idx") * bandRows.toLong)
      .withColumn("n_rows", least(lit(bandRows.toLong), col("__h") - col("row0")))
      .select(col(idCol), col("band_idx"), col("row0"), col("n_rows"),
        p.substr((col("__off") + 1L + col("row0") * col("__rs")).cast("int"),
          (col("n_rows") * col("__rs")).cast("int")).as("band"))
  }

  /** [[bmpPayload]] with an actual pixel array — caller supplies `data`
    * of exactly rowSize·height bytes (rowSize = ⌈3w/4⌉·4).
    */
  def bmpPayloadWithData(width: Column, height: Column, data: Column): Column =
    unhex(concat(
      lit(BmpMagic), hexLE(lit(54L) + length(data), 4), lit("00000000"),
      hexLE(lit(54L), 4),
      hexLE(lit(40L), 4), hexLE(width, 4), hexLE(height, 4),
      hexLE(lit(1L), 2), hexLE(lit(24L), 2), lit("0" * 48),
      hex(data)))

  /** Shared hex body for the canonical AVI layout this module reads and
    * writes: RIFF/'AVI ' → LIST hdrl holding exactly the 56-byte avih →
    * LIST movi at byte 88, '00db' uncompressed-DIB frame chunks from
    * byte 100. µsPerFrame at 32, totalFrames at 48, width/height at
    * 64/68 — the standard avih field offsets under this layout.
    */
  private def aviHeaderHex(w: Column, h: Column, usPerFrame: Column,
      totalFrames: Column, moviBytes: Column): Column =
    concat(
      lit(RiffMagic), hexLE(lit(92L) + moviBytes, 4), lit(AviMagic),
      lit(ListMagic), hexLE(lit(68L), 4), lit(HdrlMagic),
      lit(AvihMagic), hexLE(lit(56L), 4),
      hexLE(usPerFrame, 4), lit("0" * 24), // maxBytesPerSec/padding/flags = 0
      hexLE(totalFrames, 4), lit("0" * 8), hexLE(lit(1L), 4), lit("0" * 8),
      hexLE(w, 4), hexLE(h, 4), lit("0" * 32), // 16 reserved bytes
      lit(ListMagic), hexLE(lit(4L) + moviBytes, 4), lit(MoviMagic))

  /** Canonical header-only AVI (empty movi list; totalFrames still set —
    * fixture/synthesizer for [[headerMeta]]).
    */
  def aviPayload(width: Column, height: Column, usPerFrame: Column,
      totalFrames: Column): Column =
    unhex(aviHeaderHex(width, height, usPerFrame, totalFrames, lit(0L)))

  /** [[aviPayload]] with actual uncompressed-DIB frame chunks — each
    * frame's `data` must be exactly rowSize·height bytes (rowSize =
    * ⌈3w/4⌉·4, the DIB stride [[imageBands]] documents). Frame count is
    * fixed at plan time (one '00db' chunk per element); per-doc frame
    * CONTENT is a column.
    */
  def aviPayloadWithFrames(width: Column, height: Column, usPerFrame: Column,
      frames: Seq[Column]): Column = {
    val chunks = frames.map(f => concat(lit(DbMagic), hexLE(length(f), 4), hex(f)))
    val moviBytes = frames.map(f => length(f).cast("long") + 8L)
      .reduceOption(_ + _).getOrElse(lit(0L))
    unhex(concat(
      (aviHeaderHex(width, height, usPerFrame, lit(frames.size.toLong), moviBytes) +:
        chunks): _*))
  }

  /** REAL video frame extraction for canonical uncompressed-DIB AVI
    * payloads — the video member of the codec-free triple
    * ([[audioWindows]], [[imageBands]], this): with fixed-size '00db'
    * frame chunks, frame boundaries ARE closed-form byte offsets
    * (100 + k·(8+frameBytes)), so slicing a video column into per-frame
    * training rows is header arithmetic + payload slicing in codegen'd
    * columns. This replaces the byte-chunking STUB of [[sampleFrames]]
    * with a real container parse wherever the canonical layout holds;
    * [[sampleFrames]] stays as the stub for compressed containers, which
    * genuinely need a codec.
    *
    * Canonical gates (same discipline as [[audioWindows]]): RIFF/'AVI ',
    * LIST hdrl + avih at the fixed offsets, LIST movi at 88, and the
    * FIRST frame chunk must be '00db' sized exactly rowSize·height —
    * non-canonical layouts emit no rows, never wrong ones. Frame count =
    * min(avih totalFrames, frames that fit in the payload).
    *
    * Output: (idCol, frame_idx, t_ms, n_bytes, frame BINARY).
    */
  def videoFrames(df: DataFrame, idCol: String, mediaCol: String): DataFrame = {
    val p = col(s"$mediaCol.payload")
    val canonical = length(p) >= 112 && magic(p, 0, RiffMagic) &&
      magic(p, 8, AviMagic) && magic(p, 12, ListMagic) &&
      magic(p, 20, HdrlMagic) && magic(p, 24, AvihMagic) &&
      leUint(p, 28, 4) >= 56 && magic(p, 88, ListMagic) &&
      magic(p, 96, MoviMagic) && magic(p, 100, DbMagic)
    val w = leUint(p, 64, 4)
    val h = leUint(p, 68, 4)
    val cap = lit(Int.MaxValue.toLong)
    // DIB stride; factors clamped before the product for the same ANSI
    // garbage-header reason as [[dHash]] (w/h are unsigned 2^32 here)
    val rs = floor((least(w, cap) * 3 + 3).cast("double") / 4.0).cast("long") * 4L
    val fb = least(rs, cap) * least(h, cap)
    val declared = when(leUint(p, 104, 4) === fb, leUint(p, 48, 4)).otherwise(0L)
    // frames that actually fit: (len-100) div (8+fb), double-exact (both
    // operands under 2^31 whenever the result can be ≥ 1)
    val avail = floor((length(p).cast("long") - 100L).cast("double") /
      (fb + 8L).cast("double")).cast("long")
    val staged = df
      .withColumn("__fb", fb)
      .withColumn("__us", leUint(p, 32, 4))
      .withColumn("__n", least(declared, avail))
      .withColumn("__ok", canonical && w > 0 && h > 0 && col("__n") >= 1)
    staged
      .withColumn("frame_idx",
        explode(when(col("__ok"), sequence(lit(0L), col("__n") - 1L))
          .otherwise(typedLit(Array.empty[Long]))))
      .select(col(idCol), col("frame_idx"),
        floor(col("frame_idx").cast("double") * col("__us").cast("double") / 1000.0)
          .cast("long").as("t_ms"),
        col("__fb").as("n_bytes"),
        p.substr((lit(109L) + col("frame_idx") * (col("__fb") + 8L)).cast("int"),
          col("__fb").cast("int")).as("frame"))
  }

  /** 63-bit [[dHash]] of a video's KEYFRAME (frame 0) for canonical
    * uncompressed-DIB AVI payloads: slice the first '00db' frame, wrap it
    * in a BITMAPINFOHEADER (a REAL BMP construction — DIB frame bytes are
    * BMP pixel bytes at the same ⌈3w/4⌉·4 stride), and hash it through
    * the exact image pipeline. The codec-free video near-dup signature;
    * non-canonical / truncated / dim-less payloads → null (bad-record
    * tolerance). Output: (idCol, dhash LONG).
    */
  def videoKeyframeHash(df: DataFrame, idCol: String, mediaCol: String): DataFrame = {
    val p = col(s"$mediaCol.payload")
    val canonical = length(p) >= 112 && magic(p, 0, RiffMagic) &&
      magic(p, 8, AviMagic) && magic(p, 12, ListMagic) &&
      magic(p, 20, HdrlMagic) && magic(p, 24, AvihMagic) &&
      leUint(p, 28, 4) >= 56 && magic(p, 88, ListMagic) &&
      magic(p, 96, MoviMagic) && magic(p, 100, DbMagic)
    val w = leUint(p, 64, 4)
    val h = leUint(p, 68, 4)
    val cap = lit(Int.MaxValue.toLong)
    val rs = floor((least(w, cap) * 3 + 3).cast("double") / 4.0).cast("long") * 4L
    val fb = least(rs, cap) * least(h, cap)
    // subtraction, never `108 + fb` vs length (fb can be ~2^62 on garbage)
    val ok = canonical && w > 0 && h > 0 &&
      leUint(p, 104, 4) === fb && length(p).cast("long") - 108L >= fb
    val frame = p.substr(lit(109), least(fb, cap).cast("int"))
    val wrapped = df.select(col(idCol),
      asMedia(when(ok, bmpPayloadWithData(w, h, frame)), "image/bmp").as("__m"))
    dHash(wrapped, idCol, "__m")
  }

  /** Near-duplicate video pairs: keyframe hashes through the shared
    * [[bandedHammingPairs]] machinery — zero new join code for the third
    * modality.
    */
  def videoNearDupPairs(df: DataFrame, idCol: String, mediaCol: String,
      maxHamming: Int = 6, maxBucket: Int = 1000): DataFrame = {
    val hashes = Lineage.materialize(videoKeyframeHash(df, idCol, mediaCol))
      .filter(col("dhash").isNotNull)
    bandedHammingPairs(hashes, idCol, "dhash", maxHamming, maxBucket, "_vidthin")
  }

  /** Near-duplicate video removal — lower-id keeper rule, undecodable
    * payloads kept (same contract as [[dropNearDupImages]]).
    */
  def dropNearDupVideos(df: DataFrame, idCol: String, mediaCol: String,
      maxHamming: Int = 6, maxBucket: Int = 1000): DataFrame = {
    val dropped = videoNearDupPairs(df, idCol, mediaCol, maxHamming, maxBucket)
      .select(col("doc_b").as(idCol)).distinct()
    df.join(dropped, Seq(idCol), "left_anti")
  }

  /** REAL perceptual hash (difference hash, "dHash") for 24-bit
    * BITMAPINFOHEADER BMP payloads — codec-free like [[imageBands]]:
    * uncompressed BMP pixels live at closed-form byte offsets, so the
    * whole hash is header arithmetic + payload slicing in codegen'd
    * columns, no UDF, no image library.
    *
    * Shape: nearest-point sample an 8×9 luminance grid (x_i = ⌊i·w/8⌋,
    * i<8; y_j = ⌊j·h/9⌋, j<9, STORAGE row order), integer gray =
    * (B+G+R) div 3, bit j·7+i = 1 iff gray(i,j) < gray(i+1,j) — the
    * horizontal-gradient signature that survives re-encode/resize noise.
    * 63 bits, NOT 64: bit 63 would make the hash negative in signed-64
    * and overflow the DuckDB oracle's `1::BIGINT << 63`; 9 rows × 7
    * comparisons keeps every engine in positive-BIGINT range with no
    * loss that matters (dHash variants are grid-size-free).
    *
    * Non-BMP / non-24bpp / truncated payloads → null dhash (bad-record
    * tolerance). Output: (idCol, dhash LONG).
    *
    * Scale: ONE native Catalyst expression node
    * ([[org.apache.spark.sql.graft.ImageDHash]], byte-array kernel with
    * `doGenCode`) — ~nothing to plan, ~100 ns/row. The column-composition
    * twin [[dHashColumns]] stays as the oracle-transparent reference
    * implementation (identical semantics, pinned equal in MultimodalSpec)
    * and as the documentation of the exact bit recipe; it plans at ~1.5 s
    * per execution (72 staged gray trees the optimizer re-walks), which
    * is what made it the dominant cost of streaming micro-batch
    * replanning — the reason the native expression is the default.
    */
  def dHash(df: DataFrame, idCol: String, mediaCol: String): DataFrame =
    df.select(col(idCol),
      org.apache.spark.sql.graft.ImageDHash.dhash(col(s"$mediaCol.payload"))
        .as("dhash"))

  /** The column-composition reference twin of [[dHash]] — see its scale
    * note. Three narrow projections: header fields + payload staged once
    * (the optimizer must never re-walk 72 copies of the header parse),
    * then the 72 gray columns, then the 63-term bit fold; payload slices
    * are BINARY substr (O(1) random access).
    */
  private[graft] def dHashColumns(df: DataFrame, idCol: String, mediaCol: String): DataFrame = {
    val p = col(s"$mediaCol.payload")
    val isBmp24 = length(p) >= 54 && magic(p, 0, BmpMagic) &&
      leUint(p, 14, 4) === 40 && leUint(p, 28, 2) === 24
    val w = signed32(leUint(p, 18, 4))
    val h = signed32(leUint(p, 22, 4))
    val off = leUint(p, 10, 4)
    val rowSize = floor((w * 3 + 3).cast("double") / 4.0).cast("long") * 4L
    // overflow-safe size guard: a garbage header can carry w/h up to 2^31
    // each, so `off + rowSize * h` can overflow Long to negative and
    // VALIDATE a truncated payload (whose clamped slices then hash to 0,
    // colliding all such records into false near-dup pairs). Divide
    // instead of multiplying: storage rows available after the pixel
    // offset must cover h. |length-off| < 2^32 and rowSize < 2^34 are
    // both exact in double, and a misround of the floored quotient would
    // need rowSize·h < 2^31 (the payload bound) while h·rowSize ≥ 2^53·δ
    // — impossible, so the comparison is exact.
    val ok = isBmp24 && w > 0 && h > 0 &&
      floor((length(p).cast("long") - off).cast("double") /
        rowSize.cast("double")).cast("long") >= h
    val hdr = df.select(col(idCol), p.as("__p"), ok.as("__ok"),
      w.as("__w"), h.as("__h"), off.as("__off"), rowSize.as("__rs"))
    // grid magnitudes stay far under 2^53, so the double round-trips are
    // exact integer division
    def idiv(a: Column, b: Double): Column = floor(a.cast("double") / b).cast("long")
    val cap = lit(Int.MaxValue.toLong)
    def gray(i: Int, j: Int): Column = {
      val x = idiv(col("__w") * lit(i.toLong), 8.0)
      val y = idiv(col("__h") * lit(j.toLong), 9.0)
      // clamp BOTH factors before the product: gray columns evaluate on
      // every row (the __ok gate applies at the end), and a garbage
      // header's y·rowSize (~2^31·2^33) overflows Long, which under ANSI
      // is an exception, not a null. Clamped to 2^31 each the product
      // stays ≤ 2^62; valid rows sit far below the clamp (payload < 2^31
      // bytes), so this changes nothing for them.
      val pos = col("__off") + least(y, cap) * least(col("__rs"), cap) +
        lit(3L) * x // 0-based byte offset
      // clamp before the int cast: a garbage header (gated out by __ok
      // below) can carry an arbitrary off/dims, and ANSI cast would throw
      // where bad-record tolerance demands null — the clamped slice is
      // empty/garbage only on rows whose hash is nulled anyway
      val posC = least(greatest(pos + 1L, lit(1L)), cap)
      val hx = hex(col("__p").substr(posC.cast("int"), lit(3))) // "BBGGRR"
      idiv(conv(substring(hx, 1, 2), 16, 10).cast("long") +
        conv(substring(hx, 3, 2), 16, 10).cast("long") +
        conv(substring(hx, 5, 2), 16, 10).cast("long"), 3.0)
    }
    val staged = hdr.select(
      (col(idCol) +: col("__ok") +:
        (for (j <- 0 until 9; i <- 0 until 8)
          yield gray(i, j).as(s"__g_${i}_$j"))): _*)
    val bits = for (j <- 0 until 9; i <- 0 until 7) yield
      when(col(s"__g_${i}_$j") < col(s"__g_${i + 1}_$j"),
        shiftleft(lit(1L), j * 7 + i)).otherwise(0L)
    staged.select(col(idCol),
      when(col("__ok"), bits.reduce(_ bitwiseOR _)).as("dhash"))
  }

  /** Near-duplicate image pairs by banded Hamming join over [[dHash]] —
    * the image twin of [[Dedup.minhashCandidatePairs]]: never all-pairs.
    * The 63-bit hash splits into 4 bands of 16 bits ((dhash >> 16·b) &
    * 0xFFFF; the top band carries 15); candidates share at least one
    * EXACT band (pigeonhole: guaranteed recall for hamming ≤ 3, graceful
    * for larger thresholds), verification is `bit_count(xor) <=
    * maxHamming`. Both sides of the candidate join are the banded
    * equi-key — shuffle is corpus×4 rows of (band, value, id, hash).
    *
    * Hot band buckets (a corpus of near-identical images piles into one
    * (band, value)) are thinned by the [[Similarity.thinHotBuckets]]
    * md5-stride discipline: rows of buckets over `maxBucket` keep a
    * deterministic h32(id·"_imgthin") stride sample, bounding fan-out to
    * ~|corpus|·maxBucket·4 while keeping (not dropping) hot families.
    * The (band, value) size table is ≤ 4·2^16 rows — always broadcast.
    *
    * Output: (doc_a, doc_b, hamming), doc_a < doc_b, each pair once.
    */
  def imageNearDupPairs(df: DataFrame, idCol: String, mediaCol: String,
      maxHamming: Int = 6, maxBucket: Int = 1000): DataFrame = {
    require(maxHamming >= 0, s"maxHamming must be nonnegative, got $maxHamming")
    // The (id, dhash) frame is MATERIALIZED (lineage truncated) before the
    // banded self-join. A stored media column (the production case) plans
    // fine un-materialized, but a DERIVED payload column — any upstream
    // synthesize/transcode stage — gets inlined by the optimizer into all
    // 72 staged gray columns, and the self-join then SQUARES that tree:
    // Catalyst planning stops terminating (r11: >6-min planning hang at
    // sf0.001 while the dHash projection alone runs in seconds —
    // unbounded optimizer time is as fatal at scale as any shuffle). Two
    // narrow columns × corpus rows is cheap to hold; both join sides then
    // plan against a LogicalRDD leaf, bounding optimizer cost regardless
    // of how the payload was produced. ContextCleaner reclaims the blocks
    // once the query's RDD is unreferenced; iterative-loop callers that
    // hold many rounds use the explicit [[Lineage.release]] discipline.
    //
    // The null-hash filter goes AFTER the boundary on purpose: pushed
    // below it, isNotNull(dhash) substitutes through the staged
    // projections into a scan-level predicate carrying the whole payload
    // expression (observed: a 5.6 MiB task binary and a codegen fallback
    // at sf0.001); above it, the filter is a trivial predicate on a leaf
    // attribute. Null-hash rows in the materialized frame cost 2 narrow
    // columns each — nothing next to the planning they avoid.
    val hashes = Lineage.materialize(dHash(df, idCol, mediaCol))
      .filter(col("dhash").isNotNull)
    bandedHammingPairs(hashes, idCol, "dhash", maxHamming, maxBucket, "_imgthin")
  }

  /** Generic banded-Hamming candidate join over a 63-bit perceptual hash
    * column — the shared scale machinery behind [[imageNearDupPairs]] and
    * [[audioNearDupPairs]]: 4 bands of 16 bits, exact-band equi-join
    * candidates (never all-pairs), `bit_count(xor)` verification,
    * [[Similarity.thinHotBuckets]]-style md5-stride hot-bucket cap. One
    * code path for every modality, so the image cap=1 oracle twin
    * (`mm_image_neardup_thinned`) pins the stride predicate for ALL
    * callers.
    *
    * `hashes` must be (idCol, hashCol LONG) with nulls pre-filtered and
    * lineage already bounded (see the materialize note in
    * [[imageNearDupPairs]] — callers materialize their hash frame so a
    * derived payload column cannot blow up planning on both join sides).
    *
    * Output: (doc_a, doc_b, hamming), doc_a < doc_b, each pair once.
    */
  def bandedHammingPairs(hashes: DataFrame, idCol: String, hashCol: String,
      maxHamming: Int, maxBucket: Int, thinSalt: String): DataFrame = {
    require(maxHamming >= 0, s"maxHamming must be nonnegative, got $maxHamming")
    val banded = hashes.select(col(idCol), col(hashCol).as("__hsh"),
      explode(array((0 until 4).map(lit(_)): _*)).as("band"))
      .withColumn("bval",
        expr("shiftright(__hsh, band * 16)").bitwiseAND(lit(0xFFFFL)))
    val kept =
      if (maxBucket == Int.MaxValue) banded
      else {
        require(maxBucket > 0, s"maxBucket must be positive, got $maxBucket")
        val sizes = banded.groupBy("band", "bval").agg(count(lit(1)).as("__bsize"))
        val stride = ceil(col("__bsize").cast("double") / maxBucket).cast("long")
        banded.join(broadcast(sizes), Seq("band", "bval"))
          .filter(col("__bsize") <= maxBucket ||
            pmod(Text.h32(concat(col(idCol).cast("string"), lit(thinSalt))),
              stride) === 0)
          .drop("__bsize")
      }
    val a = kept.select(col("band"), col("bval"),
      col(idCol).as("doc_a"), col("__hsh").as("__ha"))
    val b = kept.select(col("band"), col("bval"),
      col(idCol).as("doc_b"), col("__hsh").as("__hb"))
    a.join(b, Seq("band", "bval"))
      .filter(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"),
        expr("bit_count(__ha ^ __hb)").cast("long").as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }

  /** Near-duplicate image removal: [[imageNearDupPairs]] → the
    * [[Dedup.dropNearDuplicates]] one-pass keeper rule (a doc is dropped
    * iff a lower-id doc is its near-duplicate) → anti-join. Keeps rows
    * whose payload doesn't hash (null dhash) — an undecodable image is
    * upstream-filter business, not dedup's.
    */
  def dropNearDupImages(df: DataFrame, idCol: String, mediaCol: String,
      maxHamming: Int = 6, maxBucket: Int = 1000): DataFrame = {
    val dropped = imageNearDupPairs(df, idCol, mediaCol, maxHamming, maxBucket)
      .select(col("doc_b").as(idCol)).distinct()
    df.join(dropped, Seq(idCol), "left_anti")
  }

  /** REAL audio fingerprint for canonical 16-bit PCM WAV payloads — the
    * audio twin of [[dHash]], equally codec-free: sample amplitude at a
    * 64-point time grid (frame f_k = ⌊k·n/64⌋ over the n sample frames,
    * first channel, 16-bit LE signed), bit k = 1 iff |s_k| < |s_{k+1}| —
    * the coarse temporal-envelope signature (a point-sampled cousin of
    * energy-difference fingerprints like Chromaprint's, honest about
    * being point-sampled: no per-window aggregation, so the whole hash
    * is header arithmetic + 64 payload slices in codegen'd columns).
    * 63 bits for the same signed-64 / DuckDB `1::BIGINT << 63` reason as
    * [[dHash]].
    *
    * Same bad-record tolerance as [[dHash]]: non-WAV / non-16-bit /
    * non-canonical / empty payloads → null fingerprint, never an
    * exception. Like [[dHash]], the default is ONE native expression
    * node ([[org.apache.spark.sql.graft.AudioFp]]); the column twin
    * [[audioFingerprintColumns]] stays as the oracle-transparent
    * reference, pinned equal in MultimodalSpec.
    *
    * Output: (idCol, afp LONG).
    */
  def audioFingerprint(df: DataFrame, idCol: String, mediaCol: String): DataFrame =
    df.select(col(idCol),
      org.apache.spark.sql.graft.AudioFp.fp(col(s"$mediaCol.payload"))
        .as("afp"))

  /** The column-composition reference twin of [[audioFingerprint]]:
    * header fields staged once, then the 64 energy columns, then the bit
    * fold. Grid positions need no overflow clamps — every factor is
    * bounded by the actual payload length (frames = dataLen div
    * blockAlign with dataLen ≤ length(p)), unlike BMP's header-declared
    * dims.
    */
  private[graft] def audioFingerprintColumns(df: DataFrame, idCol: String, mediaCol: String): DataFrame = {
    val p = col(s"$mediaCol.payload")
    val canonical = length(p) >= 46 && magic(p, 0, RiffMagic) &&
      magic(p, 8, WaveMagic) && magic(p, 12, "666D7420") &&
      magic(p, 36, "64617461")
    val ba = leUint(p, 32, 2)
    val dl = least(leUint(p, 40, 4), length(p).cast("long") - 44L)
    // __ba staged as max(ba, 1): a garbage header's blockAlign of 0 would
    // make dl/ba NaN/Inf, and the ANSI long cast throws where bad-record
    // tolerance demands null — validity still checks the RAW ba > 0
    val hdr = df.select(col(idCol), p.as("__p"),
      (canonical && leUint(p, 34, 2) === 16 && ba > 0 && dl >= ba).as("__ok"),
      greatest(ba, lit(1L)).as("__ba"), dl.as("__dl"))
    def idiv(a: Column, b: Double): Column = floor(a.cast("double") / b).cast("long")
    val n = floor(col("__dl").cast("double") / col("__ba").cast("double")).cast("long")
    def energy(k: Int): Column = {
      // frame index ⌊k·n/64⌋ ≤ n−1; 0-based byte pos 44 + f·blockAlign is
      // ≤ 44 + dl − ba by construction, so the slice is always in-bounds
      // on ok rows (and harmlessly clamped garbage on rows nulled anyway)
      val f = idiv(n * lit(k.toLong), 64.0)
      val pos = lit(44L) + f * col("__ba")
      val posC = least(greatest(pos + 1L, lit(1L)), lit(Int.MaxValue.toLong))
      val hx = hex(col("__p").substr(posC.cast("int"), lit(2))) // "LLHH" LE
      val v = conv(substring(hx, 3, 2), 16, 10).cast("long") * 256L +
        conv(substring(hx, 1, 2), 16, 10).cast("long")
      abs(when(v >= 32768L, v - 65536L).otherwise(v)) // signed16 → |amp|
    }
    val staged = hdr.select(
      (col(idCol) +: col("__ok") +:
        (0 until 64).map(k => energy(k).as(s"__e_$k"))): _*)
    val bits = (0 until 63).map(k =>
      when(col(s"__e_$k") < col(s"__e_${k + 1}"),
        shiftleft(lit(1L), k)).otherwise(0L))
    staged.select(col(idCol),
      when(col("__ok"), bits.reduce(_ bitwiseOR _)).as("afp"))
  }

  /** Near-duplicate audio pairs: [[audioFingerprint]] through the shared
    * [[bandedHammingPairs]] machinery (same lineage-materialize guard,
    * same hot-band stride — pinned oracle-exact by the image cap=1 twin).
    */
  def audioNearDupPairs(df: DataFrame, idCol: String, mediaCol: String,
      maxHamming: Int = 10, maxBucket: Int = 1000): DataFrame = {
    val hashes = Lineage.materialize(audioFingerprint(df, idCol, mediaCol))
      .filter(col("afp").isNotNull)
    bandedHammingPairs(hashes, idCol, "afp", maxHamming, maxBucket, "_audthin")
  }

  /** Near-duplicate audio removal — lower-id keeper rule, undecodable
    * payloads kept (same contract as [[dropNearDupImages]]).
    */
  def dropNearDupAudio(df: DataFrame, idCol: String, mediaCol: String,
      maxHamming: Int = 10, maxBucket: Int = 1000): DataFrame = {
    val dropped = audioNearDupPairs(df, idCol, mediaCol, maxHamming, maxBucket)
      .select(col("doc_b").as(idCol)).distinct()
    df.join(dropped, Seq(idCol), "left_anti")
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
