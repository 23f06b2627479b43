package graft

import java.nio.{ByteBuffer, ByteOrder}

import org.apache.spark.sql.functions._
import graft.ops.Multimodal

/** Real header decode: parse BMP/WAV/PNG headers hand-built with ByteBuffer
  * (independent of the column-expression synthesizers, so offsets and
  * endianness are cross-checked), tolerate garbage, and round-trip the
  * synthesizers.
  */
class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private def bmp(width: Int, height: Int): Array[Byte] = {
    val b = ByteBuffer.allocate(54).order(ByteOrder.LITTLE_ENDIAN)
    b.put('B'.toByte).put('M'.toByte).putInt(54).putInt(0).putInt(54)
    b.putInt(40).putInt(width).putInt(height).putShort(1).putShort(24)
    b.array()
  }

  private def wav(rate: Int, channels: Short, bits: Short, dataSize: Int): Array[Byte] = {
    val b = ByteBuffer.allocate(44).order(ByteOrder.LITTLE_ENDIAN)
    b.put("RIFF".getBytes).putInt(36 + dataSize).put("WAVE".getBytes)
    b.put("fmt ".getBytes).putInt(16).putShort(1).putShort(channels)
    b.putInt(rate).putInt(rate * channels * bits / 8)
    b.putShort((channels * bits / 8).toShort).putShort(bits)
    b.put("data".getBytes).putInt(dataSize)
    b.array()
  }

  private def png(width: Int, height: Int): Array[Byte] = {
    val b = ByteBuffer.allocate(33).order(ByteOrder.BIG_ENDIAN)
    b.put(Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte))
    b.putInt(13).put("IHDR".getBytes).putInt(width).putInt(height)
    b.put(Array[Byte](8, 2, 0, 0, 0)).putInt(0)
    b.array()
  }

  private def parse(payloads: (Long, Array[Byte])*) =
    payloads.toSeq.toDF("id", "p")
      .select(col("id"), Multimodal.headerMeta(col("p")).as("m"))
      .select("id", "m.*").collect().map(r => r.getLong(0) -> r).toMap

  test("fixed-offset header fields parse from independently crafted bytes") {
    val got = parse(
      1L -> bmp(640, 480), 2L -> bmp(33000, -480) /* top-down, >int16 */,
      3L -> wav(44100, 2, 16, 88200), 4L -> png(800, 600))
    assert(got(1L).getAs[String]("fmt") === "bmp")
    assert(got(1L).getAs[Long]("width") === 640L)
    assert(got(1L).getAs[Long]("height") === 480L)
    assert(got(2L).getAs[Long]("width") === 33000L)
    assert(got(2L).getAs[Long]("height") === -480L, "signed int32 height")
    assert(got(3L).getAs[String]("fmt") === "wav")
    assert(got(3L).getAs[Long]("sample_rate") === 44100L)
    assert(got(3L).getAs[Long]("channels") === 2L)
    assert(got(3L).getAs[Long]("bits_per_sample") === 16L)
    assert(got(3L).getAs[Long]("duration_ms") === 500L, "88200B at 176400B/s")
    assert(got(4L).getAs[String]("fmt") === "png")
    assert(got(4L).getAs[Long]("width") === 800L)
    assert(got(4L).getAs[Long]("height") === 600L)
  }

  test("non-canonical layouts keep fmt but null the fields the chunk gate rejects") {
    // a valid WAV whose FIRST chunk is JUNK: audio params at the canonical
    // offsets would be chunk bytes — the fmt-gate must null them instead
    val junkWav = {
      val b = ByteBuffer.allocate(44).order(ByteOrder.LITTLE_ENDIAN)
      b.put("RIFF".getBytes).putInt(36).put("WAVE".getBytes)
      b.put("JUNK".getBytes).putInt(16).put(new Array[Byte](16))
      b.put("NOPE".getBytes).putInt(0)
      b.array()
    }
    // a BITMAPCOREHEADER bmp (biSize 12, 16-bit dims at other offsets)
    val coreBmp = {
      val b = ByteBuffer.allocate(26).order(ByteOrder.LITTLE_ENDIAN)
      b.put('B'.toByte).put('M'.toByte).putInt(26).putInt(0).putInt(26)
      b.putInt(12).putShort(640).putShort(480).putShort(1).putShort(24)
      b.array()
    }
    val out = Seq((1L, junkWav), (2L, coreBmp)).toDF("id", "p")
      .select($"id", Multimodal.headerMeta($"p").as("m")).select("id", "m.*")
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(out(1L).getString(1) === "wav")
    assert(out(1L).isNullAt(4) && out(1L).isNullAt(5) && out(1L).isNullAt(6),
      "JUNK-chunk WAV must not parse chunk bytes as audio params")
    assert(out(2L).getString(1) === "bmp")
    assert(out(2L).isNullAt(2) && out(2L).isNullAt(3),
      "BITMAPCOREHEADER dims must not be read at INFOHEADER offsets")
  }

  test("garbage, truncated, and null payloads give all-null metadata, no error") {
    val got = parse(
      1L -> "not a media file at all, just text".getBytes,
      2L -> bmp(640, 480).take(10), 3L -> Array.empty[Byte], 4L -> null)
    got.values.foreach { r =>
      assert(r.getAs[String]("fmt") == null, r.toString)
      assert(r.isNullAt(r.fieldIndex("width")) && r.isNullAt(r.fieldIndex("sample_rate")))
    }
  }

  test("synthesizers round-trip through the parser") {
    val df = Seq((7L, 123L, 45L, 22050L)).toDF("id", "w", "h", "sr")
      .select(col("id"),
        Multimodal.headerMeta(Multimodal.bmpPayload(col("w"), col("h"))).as("b"),
        Multimodal.headerMeta(Multimodal.pngPayload(col("w"), col("h"))).as("p"),
        Multimodal.headerMeta(Multimodal.wavPayload(col("sr"), lit(1L), lit(8L))).as("a"))
      .collect().head
    val (b, p, a) = (df.getStruct(1), df.getStruct(2), df.getStruct(3))
    assert(b.getAs[String]("fmt") === "bmp" && b.getAs[Long]("width") === 123L
      && b.getAs[Long]("height") === 45L)
    assert(p.getAs[String]("fmt") === "png" && p.getAs[Long]("width") === 123L
      && p.getAs[Long]("height") === 45L)
    assert(a.getAs[String]("fmt") === "wav" && a.getAs[Long]("sample_rate") === 22050L
      && a.getAs[Long]("channels") === 1L && a.getAs[Long]("duration_ms") === 0L)
  }

  test("audio windows: real byte-exact PCM slicing, aligned, lossless recombination") {
    // 8 kHz mono 16-bit → blockAlign 2, byteRate 16000; 35 000 data bytes
    val data = Array.tabulate(35000)(i => (i % 251).toByte)
    val wav = Seq(Tuple1(1L)).toDF("media_id")
      .withColumn("media", Multimodal.asMedia(
        Multimodal.wavPayloadWithData(lit(8000L), lit(1L), lit(16L), lit(data)),
        "audio/wav"))
    val win = Multimodal.audioWindows(wav, "media_id", "media", windowMs = 1000)
      .orderBy("window_idx")
      .select("window_idx", "start_ms", "n_bytes", "samples")
      .as[(Long, Long, Long, Array[Byte])].collect()
    // 1 s of 16 kB/s audio = 16 000-byte windows: 16 000 + 16 000 + 3 000
    assert(win.map(w => (w._1, w._2, w._3)).toSeq ==
      Seq((0L, 0L, 16000L), (1L, 1000L, 16000L), (2L, 2000L, 3000L)))
    // no window splits a sample frame
    assert(win.forall(_._3 % 2 == 0))
    // concatenating the windows reproduces the data chunk byte-for-byte
    assert(win.flatMap(_._4).toSeq == data.toSeq)

    // sub-second windows: 250 ms → 4000-byte windows, 9 of them
    val fine = Multimodal.audioWindows(wav, "media_id", "media", windowMs = 250)
      .select("n_bytes").as[Long].collect()
    assert(fine.length === 9 && fine.sum === 35000L)

    // non-WAV and headerless payloads emit no rows, never an error
    val png = Seq(Tuple1(2L)).toDF("media_id")
      .withColumn("media", Multimodal.asMedia(
        Multimodal.pngPayload(lit(3L), lit(2L)), "image/png"))
    assert(Multimodal.audioWindows(png, "media_id", "media").count() === 0L)
    // empty data chunk (the header-only synthesizer) → no windows
    val empty = Seq(Tuple1(3L)).toDF("media_id")
      .withColumn("media", Multimodal.asMedia(
        Multimodal.wavPayload(lit(8000L), lit(1L), lit(16L)), "audio/wav"))
    assert(Multimodal.audioWindows(empty, "media_id", "media").count() === 0L)
  }

  test("image bands: stride-exact BMP row slicing, lossless recombination") {
    // w=5 → rowSize (15+3)/4·4 = 16; h=7 rows, bandRows=3 → 3+3+1
    val rowSize = 16
    val data = Array.tabulate(rowSize * 7)(i => (i % 249).toByte)
    val bmp = Seq(Tuple1(1L)).toDF("media_id")
      .withColumn("media", Multimodal.asMedia(
        Multimodal.bmpPayloadWithData(lit(5L), lit(7L), lit(data)), "image/bmp"))
    val bands = Multimodal.imageBands(bmp, "media_id", "media", bandRows = 3)
      .orderBy("band_idx")
      .select("band_idx", "row0", "n_rows", "band")
      .as[(Long, Long, Long, Array[Byte])].collect()
    assert(bands.map(b => (b._1, b._2, b._3)).toSeq ==
      Seq((0L, 0L, 3L), (1L, 3L, 3L), (2L, 6L, 1L)))
    // every band is whole rows; recombination reproduces the pixel array
    assert(bands.forall(b => b._4.length == b._3 * rowSize))
    assert(bands.flatMap(_._4).toSeq == data.toSeq)
    // truncated pixel array (header-only synthesizer) and non-BMP → no rows
    val headerOnly = Seq(Tuple1(2L)).toDF("media_id")
      .withColumn("media", Multimodal.asMedia(
        Multimodal.bmpPayload(lit(5L), lit(7L)), "image/bmp"))
    assert(Multimodal.imageBands(headerOnly, "media_id", "media").count() === 0L)
    val wav = Seq(Tuple1(3L)).toDF("media_id")
      .withColumn("media", Multimodal.asMedia(
        Multimodal.wavPayload(lit(8000L), lit(1L), lit(16L)), "audio/wav"))
    assert(Multimodal.imageBands(wav, "media_id", "media").count() === 0L)
  }

  test("withHeaderMeta fills the media struct from the real parse") {
    val df = Seq((1L, bmp(320, 200))).toDF("id", "payload")
      .select(col("id"), Multimodal.asMedia(col("payload"), "image/bmp").as("media"))
    val out = Multimodal.withHeaderMeta(df, "media").select("media.*").collect().head
    assert(out.getAs[Int]("width") === 320 && out.getAs[Int]("height") === 200)
    assert(out.getAs[String]("mime") === "image/bmp")
  }

  // ---- dHash: real perceptual hashing over real BMP pixel bytes ----

  /** 24bpp BMP with a real pixel array, ByteBuffer-built (independent of
    * the column synthesizers — offsets/endianness cross-checked).
    */
  private def bmpWithData(width: Int, height: Int, data: Array[Byte]): Array[Byte] = {
    val b = ByteBuffer.allocate(54 + data.length).order(ByteOrder.LITTLE_ENDIAN)
    b.put('B'.toByte).put('M'.toByte).putInt(54 + data.length).putInt(0).putInt(54)
    b.putInt(40).putInt(width).putInt(height).putShort(1).putShort(24)
    b.position(54) // rest of BITMAPINFOHEADER stays zero (BI_RGB)
    b.put(data)
    b.array()
  }

  /** Independent plain-Scala dHash — the Spark column pipeline must agree
    * with this byte-level reference bit for bit.
    */
  private def refDHash(payload: Array[Byte]): Option[Long] = {
    if (payload.length < 54 || payload(0) != 'B' || payload(1) != 'M') return None
    def le(off: Int, n: Int): Long =
      (0 until n).map(k => (payload(off + k) & 0xffL) << (8 * k)).sum
    if (le(14, 4) != 40 || le(28, 2) != 24) return None
    val w = le(18, 4).toInt; val h = le(22, 4).toInt
    val off = le(10, 4).toInt
    val rs = ((w * 3 + 3) / 4) * 4
    if (w <= 0 || h <= 0 || payload.length < off + rs.toLong * h) return None
    def gray(i: Int, j: Int): Long = {
      val x = i * w / 8; val y = j * h / 9
      val pos = off + y * rs + 3 * x
      ((payload(pos) & 0xff) + (payload(pos + 1) & 0xff) + (payload(pos + 2) & 0xff)) / 3L
    }
    var hash = 0L
    for (j <- 0 until 9; i <- 0 until 7)
      if (gray(i, j) < gray(i + 1, j)) hash |= 1L << (j * 7 + i)
    Some(hash)
  }

  private def mediaDf(rows: Seq[(Long, Array[Byte])]) =
    rows.toDF("id", "p")
      .select(col("id"), Multimodal.asMedia(col("p"), "image/bmp").as("media"))

  test("dHash agrees bit-for-bit with the independent byte-level reference") {
    val rnd = new scala.util.Random(42)
    def img(w: Int, h: Int): Array[Byte] = {
      val rs = ((w * 3 + 3) / 4) * 4
      val d = new Array[Byte](rs * h); rnd.nextBytes(d); d
    }
    // dims straddle the grid: w<8 / h<9 repeat samples, larger ones stride
    val cases = Seq((1L, 16, 12), (2L, 5, 4), (3L, 33, 9), (4L, 8, 9),
      (5L, 100, 60), (6L, 7, 30))
    val payloads = cases.map { case (id, w, h) => id -> bmpWithData(w, h, img(w, h)) }
    val got = Multimodal.dHash(mediaDf(payloads), "id", "media")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    payloads.foreach { case (id, p) =>
      assert(got(id) === refDHash(p).get, s"id $id")
      assert(got(id) >= 0L, "63-bit hash must stay positive")
    }
    // invalid payloads → null dhash, no exception
    val bad = mediaDf(Seq(7L -> Array[Byte](1, 2, 3), 8L -> wav(8000, 1, 16, 0)))
    val badOut = Multimodal.dHash(bad, "id", "media").collect()
    assert(badOut.forall(_.isNullAt(1)))
    // the native expression (the default) and the column-composition
    // reference twin must agree bit for bit — valid AND invalid payloads
    val allRows = payloads ++ Seq(7L -> Array[Byte](1, 2, 3), 8L -> wav(8000, 1, 16, 0))
    def asMap(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) null else java.lang.Long.valueOf(r.getLong(1)))).toMap
    assert(asMap(Multimodal.dHash(mediaDf(allRows), "id", "media")) ===
      asMap(Multimodal.dHashColumns(mediaDf(allRows), "id", "media")))
  }

  test("banded Hamming near-dup ≡ brute force at the pigeonhole-guaranteed threshold") {
    val rnd = new scala.util.Random(7)
    val rs = ((16 * 3 + 3) / 4) * 4
    val base = new Array[Byte](rs * 12); rnd.nextBytes(base)
    def mutate(nBytes: Int, seed: Int): Array[Byte] = {
      val r = new scala.util.Random(seed); val d = base.clone()
      (0 until nBytes).foreach(_ => d(r.nextInt(d.length)) = r.nextInt(256).toByte)
      d
    }
    val payloads = (0L until 20L).map(id =>
      id -> bmpWithData(16, 12, mutate((id % 5).toInt * 6, id.toInt)))
    // maxHamming=3 with 4 bands of 16: pigeonhole guarantees a shared band,
    // so the banded set must EQUAL brute force, not approximate it
    val banded = Multimodal.imageNearDupPairs(mediaDf(payloads), "id", "media",
        maxHamming = 3, maxBucket = Int.MaxValue)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val hashes = payloads.map { case (id, p) => id -> refDHash(p).get }
    val brute = (for {
      (a, ha) <- hashes; (b, hb) <- hashes if a < b
      d = java.lang.Long.bitCount(ha ^ hb) if d <= 3
    } yield (a, b, d.toLong)).toSet
    assert(banded === brute)
    assert(brute.nonEmpty, "fixture must exercise at least one pair")
    // keeper rule: dropped ⊆ docs with a lower-id near-dup; undecodable kept
    val withBad = payloads :+ (99L -> Array[Byte](0, 1))
    val kept = Multimodal.dropNearDupImages(mediaDf(withBad), "id", "media",
        maxHamming = 3, maxBucket = Int.MaxValue)
      .select("id").collect().map(_.getLong(0)).toSet
    val expectDropped = brute.map(_._2)
    assert(kept === (withBad.map(_._1).toSet -- expectDropped))
    assert(kept.contains(99L), "undecodable payloads are not dedup's to drop")
  }

  test("garbage headers with overflowing dims null out instead of hash-colliding") {
    // w=h=Int.MaxValue: `off + rowSize·h` overflows Long to negative,
    // which would VALIDATE the truncated payload under a product-form
    // guard — every such record then hashes to 0 (clamped empty slices →
    // null grays → all comparisons false) and they all collide into false
    // near-dup pairs. The division-form guard must null them out.
    val evil = (0L until 2L).map(id =>
      id -> bmpWithData(Int.MaxValue, Int.MaxValue, Array[Byte](1, 2, 3, 4, 5)))
    val out = Multimodal.dHash(mediaDf(evil), "id", "media").collect()
    assert(out.length === 2 && out.forall(_.isNullAt(1)))
    assert(Multimodal.imageNearDupPairs(mediaDf(evil), "id", "media",
      maxHamming = 63, maxBucket = Int.MaxValue).count() === 0L)
    assert(Multimodal.imageBands(mediaDf(evil), "id", "media").count() === 0L)
  }

  test("native resize matches an independent byte-level nearest-neighbor reference") {
    val rnd = new scala.util.Random(7)
    def img(w: Int, h: Int): Array[Byte] = {
      val rs = ((w * 3 + 3) / 4) * 4
      val d = new Array[Byte](rs * h); rnd.nextBytes(d); d
    }
    // independent reference (ByteBuffer header, explicit loops)
    def refResize(p: Array[Byte], w2: Int, h2: Int): Array[Byte] = {
      def le(off: Int, n: Int): Long =
        (0 until n).map(k => (p(off + k) & 0xffL) << (8 * k)).sum
      val w = le(18, 4).toInt; val h = le(22, 4).toInt; val off = le(10, 4).toInt
      val rs = ((w * 3 + 3) / 4) * 4; val rs2 = ((w2 * 3 + 3) / 4) * 4
      val data = new Array[Byte](rs2 * h2)
      for (j <- 0 until h2; i <- 0 until w2; c <- 0 until 3)
        data(j * rs2 + 3 * i + c) = p(off + (h * j / h2) * rs + 3 * (w * i / w2) + c)
      bmpWithData(w2, h2, data)
    }
    // up, down, non-divisible, and pad-introducing (w2=5 → stride 16) dims
    val cases = Seq((16, 12, 8, 6), (5, 4, 16, 12), (33, 9, 5, 5), (7, 30, 7, 30))
    cases.zipWithIndex.foreach { case ((w, h, w2, h2), idx) =>
      val p = bmpWithData(w, h, img(w, h))
      val got = mediaDf(Seq(idx.toLong -> p))
        .select(graft.functions.Native.resizeBmp(col("media.payload"), w2, h2))
        .head().getAs[Array[Byte]](0)
      assert(got.toSeq === refResize(p, w2, h2).toSeq, s"dims $w x $h -> $w2 x $h2")
    }
    // same-dims resize is dHash-invariant (the hash samples the same grid)
    val keep = bmpWithData(16, 12, img(16, 12))
    val df = mediaDf(Seq(1L -> keep))
      .select(col("id"), Multimodal.asMedia(
        graft.functions.Native.resizeBmp(col("media.payload"), 16, 12),
        "image/bmp").as("media"))
    assert(Multimodal.dHash(df, "id", "media").head().getLong(1)
      === refDHash(keep).get)
    // null contract: garbage and overflow-dim payloads resize to null
    val bad = mediaDf(Seq(
      7L -> Array[Byte](1, 2, 3),
      8L -> wav(8000, 1, 16, 0),
      9L -> bmpWithData(Int.MaxValue, Int.MaxValue, Array[Byte](1, 2, 3))))
    assert(bad.select(graft.functions.Native.resizeBmp(col("media.payload"), 4, 4))
      .collect().forall(_.isNullAt(0)))
  }

  // ---- AVI: real container parse + frame slicing over real bytes ----

  /** Canonical uncompressed-DIB AVI, ByteBuffer-built (independent of the
    * column synthesizer — offsets and endianness cross-checked).
    */
  private def avi(w: Int, h: Int, usPerFrame: Int,
      frames: Seq[Array[Byte]]): Array[Byte] = {
    val movi = frames.map(_.length + 8).sum
    val b = ByteBuffer.allocate(100 + movi).order(ByteOrder.LITTLE_ENDIAN)
    b.put("RIFF".getBytes).putInt(92 + movi).put("AVI ".getBytes)
    b.put("LIST".getBytes).putInt(68).put("hdrl".getBytes)
    b.put("avih".getBytes).putInt(56)
    b.putInt(usPerFrame).putInt(0).putInt(0).putInt(0)
    b.putInt(frames.size).putInt(0).putInt(1).putInt(0)
    b.putInt(w).putInt(h)
    b.position(b.position() + 16) // reserved
    b.put("LIST".getBytes).putInt(4 + movi).put("movi".getBytes)
    frames.foreach { f => b.put("00db".getBytes).putInt(f.length).put(f) }
    b.array()
  }

  test("avi header fields parse from independently crafted bytes") {
    val rnd = new scala.util.Random(17)
    val fb = 12 * 2 // w=3 → stride 12, h=2
    val fs = Seq.fill(3)({ val d = new Array[Byte](fb); rnd.nextBytes(d); d })
    val m = parse(1L -> avi(3, 2, 33333, fs), 2L -> avi(640, 480, 40000, Nil))
    assert(m(1L).getAs[String]("fmt") === "avi")
    assert(m(1L).getAs[Long]("width") === 3L)
    assert(m(1L).getAs[Long]("height") === 2L)
    assert(m(1L).getAs[Long]("duration_ms") === 3L * 33333 / 1000)
    assert(m(1L).isNullAt(m(1L).fieldIndex("sample_rate")))
    assert(m(2L).getAs[Long]("width") === 640L)
    assert(m(2L).getAs[Long]("duration_ms") === 0L) // zero frames
  }

  test("video frames: container-exact slicing, truncation-aware, garbage-tolerant") {
    val rnd = new scala.util.Random(19)
    val fb = 12 * 2
    val fs = Seq.fill(3)({ val d = new Array[Byte](fb); rnd.nextBytes(d); d })
    val full = avi(3, 2, 33333, fs)
    // truncated: header claims 3 frames, payload carries 2
    val truncated = java.util.Arrays.copyOfRange(full, 0, 100 + 2 * (8 + fb))
    // first chunk sized wrong for the declared dims → no rows, not garbage rows
    val wrongSize = avi(3, 2, 33333, Seq(new Array[Byte](fb + 4)))
    val df = audioDf(Seq(1L -> full, 2L -> truncated, 3L -> wrongSize,
      4L -> Array[Byte](9, 9, 9), 5L -> bmp(4, 4)))
    val rows = Multimodal.videoFrames(df, "id", "media")
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getAs[Array[Byte]]("frame")))).toMap
    assert(rows.keySet === Set((1L, 0L), (1L, 1L), (1L, 2L), (2L, 0L), (2L, 1L)))
    (0 until 3).foreach { k =>
      val (tMs, nBytes, frame) = rows((1L, k.toLong))
      assert(tMs === k.toLong * 33333 / 1000)
      assert(nBytes === fb.toLong)
      assert(frame.toSeq === fs(k).toSeq, s"frame $k bytes")
    }
    assert(rows((2L, 1L))._3.toSeq === fs(1).toSeq)
  }

  test("avi synthesizers round-trip through the parser and the frame slicer") {
    import spark.implicits._
    val df = Seq((7L, "payloadseed")).toDF("id", "seed")
      .select(col("id"), Multimodal.asMedia(
        Multimodal.aviPayloadWithFrames(lit(3L), lit(2L), lit(20000L),
          (0 until 2).map(k =>
            encode(substring(concat(md5(concat(col("seed"), lit(k.toString))),
              md5(col("seed"))), 1, 24), "UTF-8"))), "video/avi").as("media"))
    val meta = df.select(Multimodal.headerMeta(col("media.payload")).as("m"))
      .select("m.*").collect().head
    assert(meta.getAs[String]("fmt") === "avi")
    assert(meta.getAs[Long]("width") === 3L)
    assert(meta.getAs[Long]("duration_ms") === 2L * 20000 / 1000)
    val frames = Multimodal.videoFrames(df, "id", "media").collect()
    assert(frames.length === 2)
    assert(frames.forall(_.getAs[Long]("n_bytes") === 24L))
  }

  test("video near-dup composes keyframe dHash with the shared banded join") {
    val rnd = new scala.util.Random(31)
    val rs = ((16 * 3 + 3) / 4) * 4
    val base = new Array[Byte](rs * 12); rnd.nextBytes(base)
    def mutate(nBytes: Int, seed: Int): Array[Byte] = {
      val r = new scala.util.Random(seed); val d = base.clone()
      (0 until nBytes).foreach(_ => d(r.nextInt(d.length)) = r.nextInt(256).toByte)
      d
    }
    // keyframe families; the SECOND frame is pure noise and must not
    // affect the signature
    val keyframes = (0L until 16L).map(id => id -> mutate((id % 4).toInt * 5, id.toInt)).toMap
    val payloads = (0L until 16L).map { id =>
      val f1 = new Array[Byte](rs * 12); rnd.nextBytes(f1)
      id -> avi(16, 12, 33333, Seq(keyframes(id), f1))
    }
    // the keyframe hash IS the wrapped-BMP dHash, bit for bit
    val got = Multimodal.videoKeyframeHash(audioDf(payloads), "id", "media")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val ref = keyframes.map { case (id, f0) => id -> refDHash(bmpWithData(16, 12, f0)).get }
    assert(got === ref)
    // banded ≡ brute at the pigeonhole-guaranteed threshold
    val banded = Multimodal.videoNearDupPairs(audioDf(payloads), "id", "media",
        maxHamming = 3, maxBucket = Int.MaxValue)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val brute = (for {
      (a, ha) <- ref.toSeq; (b, hb) <- ref.toSeq if a < b
      d = java.lang.Long.bitCount(ha ^ hb) if d <= 3
    } yield (a, b, d.toLong)).toSet
    assert(banded === brute)
    assert(brute.nonEmpty, "fixture must exercise at least one pair")
    // keeper rule; undecodable payloads kept
    val withBad = payloads :+ (99L -> Array[Byte](3, 1))
    val kept = Multimodal.dropNearDupVideos(audioDf(withBad), "id", "media",
        maxHamming = 3, maxBucket = Int.MaxValue)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(kept === (withBad.map(_._1).toSet -- brute.map(_._2)))
    assert(kept.contains(99L))
  }

  // ---- audio fingerprint: real PCM amplitude sampling over real bytes ----

  /** Canonical PCM WAV with a real data chunk, ByteBuffer-built
    * (independent of the column synthesizers).
    */
  private def wavWithData(rate: Int, channels: Short, bits: Short,
      data: Array[Byte]): Array[Byte] = {
    val b = ByteBuffer.allocate(44 + data.length).order(ByteOrder.LITTLE_ENDIAN)
    b.put("RIFF".getBytes).putInt(36 + data.length).put("WAVE".getBytes)
    b.put("fmt ".getBytes).putInt(16).putShort(1).putShort(channels)
    b.putInt(rate).putInt(rate * channels * bits / 8)
    b.putShort((channels * bits / 8).toShort).putShort(bits)
    b.put("data".getBytes).putInt(data.length)
    b.put(data)
    b.array()
  }

  /** Independent plain-Scala fingerprint — the Spark column pipeline must
    * agree with this byte-level reference bit for bit.
    */
  private def refAudioFp(payload: Array[Byte]): Option[Long] = {
    if (payload.length < 46) return None
    def str4(off: Int) = new String(payload, off, 4, "US-ASCII")
    if (str4(0) != "RIFF" || str4(8) != "WAVE" ||
      str4(12) != "fmt " || str4(36) != "data") return None
    def le(off: Int, n: Int): Long =
      (0 until n).map(k => (payload(off + k) & 0xffL) << (8 * k)).sum
    val bps = le(34, 2); val ba = le(32, 2)
    val dl = math.min(le(40, 4), payload.length - 44L)
    if (bps != 16 || ba <= 0 || dl < ba) return None
    val n = dl / ba
    def energy(k: Int): Long = {
      val f = n * k / 64
      val pos = (44 + f * ba).toInt
      val v = ((payload(pos) & 0xff) | ((payload(pos + 1) & 0xff) << 8)).toLong
      math.abs(if (v >= 32768) v - 65536 else v)
    }
    var hsh = 0L
    for (k <- 0 until 63) if (energy(k) < energy(k + 1)) hsh |= 1L << k
    Some(hsh)
  }

  private def audioDf(rows: Seq[(Long, Array[Byte])]) =
    rows.toDF("id", "p")
      .select(col("id"), Multimodal.asMedia(col("p"), "audio/wav").as("media"))

  test("audio fingerprint agrees bit-for-bit with the independent reference") {
    val rnd = new scala.util.Random(13)
    def pcm(frames: Int, ba: Int): Array[Byte] = {
      val d = new Array[Byte](frames * ba); rnd.nextBytes(d); d
    }
    // frame counts straddle the 64-point grid; mono and stereo strides
    val cases = Seq((1L, 8000, 1: Short, 128), (2L, 16000, 2: Short, 64),
      (3L, 44100, 1: Short, 63), (4L, 8000, 2: Short, 1000), (5L, 8000, 1: Short, 1))
    val payloads = cases.map { case (id, r, ch, frames) =>
      id -> wavWithData(r, ch, 16, pcm(frames, ch * 2))
    }
    val got = Multimodal.audioFingerprint(audioDf(payloads), "id", "media")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    payloads.foreach { case (id, p) =>
      assert(got(id) === refAudioFp(p).get, s"id $id")
      assert(got(id) >= 0L, "63-bit fingerprint must stay positive")
    }
    // invalid payloads → null fingerprint, no exception: garbage, 8-bit
    // PCM, empty data chunk, a BMP
    val bad = audioDf(Seq(
      7L -> Array[Byte](1, 2, 3),
      8L -> wavWithData(8000, 1, 8, Array.fill(64)(1: Byte)),
      9L -> wav(8000, 1, 16, 0),
      10L -> bmp(4, 4)))
    val badOut = Multimodal.audioFingerprint(bad, "id", "media").collect()
    assert(badOut.length === 4 && badOut.forall(_.isNullAt(1)))
    // native default ≡ column-composition reference twin, valid + invalid
    val allRows = payloads ++ Seq(7L -> Array[Byte](1, 2, 3),
      8L -> wavWithData(8000, 1, 8, Array.fill(64)(1: Byte)), 10L -> bmp(4, 4))
    def asMap(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) null else java.lang.Long.valueOf(r.getLong(1)))).toMap
    assert(asMap(Multimodal.audioFingerprint(audioDf(allRows), "id", "media")) ===
      asMap(Multimodal.audioFingerprintColumns(audioDf(allRows), "id", "media")))
  }

  test("audio near-dup rides the shared banded join: banded ≡ brute at h≤3") {
    val rnd = new scala.util.Random(29)
    val base = new Array[Byte](256); rnd.nextBytes(base)
    def mutate(nBytes: Int, seed: Int): Array[Byte] = {
      val r = new scala.util.Random(seed); val d = base.clone()
      (0 until nBytes).foreach(_ => d(r.nextInt(d.length)) = r.nextInt(256).toByte)
      d
    }
    val payloads = (0L until 20L).map(id =>
      id -> wavWithData(8000, 1, 16, mutate((id % 5).toInt * 4, id.toInt)))
    val banded = Multimodal.audioNearDupPairs(audioDf(payloads), "id", "media",
        maxHamming = 3, maxBucket = Int.MaxValue)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val hashes = payloads.map { case (id, p) => id -> refAudioFp(p).get }
    val brute = (for {
      (a, ha) <- hashes; (b, hb) <- hashes if a < b
      d = java.lang.Long.bitCount(ha ^ hb) if d <= 3
    } yield (a, b, d.toLong)).toSet
    assert(banded === brute)
    assert(brute.nonEmpty, "fixture must exercise at least one pair")
    // keeper rule + undecodable payloads kept
    val withBad = payloads :+ (99L -> Array[Byte](0, 1))
    val kept = Multimodal.dropNearDupAudio(audioDf(withBad), "id", "media",
        maxHamming = 3, maxBucket = Int.MaxValue)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(kept === (withBad.map(_._1).toSet -- brute.map(_._2)))
    assert(kept.contains(99L), "undecodable payloads are not dedup's to drop")
  }

  test("hot-band stride thinning: capped output is a subset, hot family survives") {
    // 12 identical images = one hot (band,value) bucket per band at cap 4
    val rnd = new scala.util.Random(11)
    val rs = ((16 * 3 + 3) / 4) * 4
    val base = new Array[Byte](rs * 12); rnd.nextBytes(base)
    val payloads = (0L until 12L).map(id => id -> bmpWithData(16, 12, base))
    val full = Multimodal.imageNearDupPairs(mediaDf(payloads), "id", "media",
        maxHamming = 0, maxBucket = Int.MaxValue)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val capped = Multimodal.imageNearDupPairs(mediaDf(payloads), "id", "media",
        maxHamming = 0, maxBucket = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(full.size === 12 * 11 / 2)
    assert(capped.subsetOf(full) && capped.nonEmpty,
      "stride keeps a deterministic sample of the hot family")
  }
}
