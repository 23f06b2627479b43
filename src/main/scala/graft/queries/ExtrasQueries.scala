package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.Udfs
import graft.ops.Text

/** Coverage extras: UDF/UDAF/UDTF surface (U1-U3), remaining per-record
  * transforms (P2 flatMapValues, P4 selectKey), full-outer windowed join
  * batch twin (J3), and the multimodal binary-column families — header
  * metadata, audio windows + fingerprint + near-dup, image bands + dHash
  * + near-dup, AVI frames + keyframe hash — each with a DuckDB oracle
  * that recomputes the result from a generative closed form, never from
  * the binary.
  */
object ExtrasQueries extends QueryModule {

  private val windowUs: Long = 2L * 3600 * 1000000

  /** Synthesized 16×12 24bpp BMP corpus for the dHash queries: pixel data
    * is 576 ASCII chars (rowSize 48 × 12 rows) — a base image per `source`
    * (repeat(md5(source), 18)) with storage row (doc_id % 12) overwritten
    * by doc-specific bytes. Same-source docs are near-duplicates (≤ 2
    * differing rows → small Hamming distance); cross-source hashes are
    * unrelated. Closed-form in (source, doc_id) so the DuckDB oracle can
    * regenerate the pixel STRING and never needs the binary.
    */
  private def dhashMedia(s: SparkSession, d: String): DataFrame = {
    import graft.ops.Multimodal
    val pr = col("doc_id") % 12
    val base = repeat(md5(col("source")), 18)
    val rowStr = repeat(md5(col("doc_id").cast("string")), 2).substr(lit(1), lit(48))
    val dataStr = concat(
      base.substr(lit(1), (pr * 48).cast("int")),
      rowStr,
      base.substr((pr * 48 + 49).cast("int"), (lit(576) - (pr + 1) * 48).cast("int")))
    Tables.documents(s, d).select(col("doc_id"),
      Multimodal.asMedia(
        Multimodal.bmpPayloadWithData(lit(16L), lit(12L), encode(dataStr, "UTF-8")),
        "image/bmp").as("media"))
  }

  /** The dHash closed form as DuckDB CTEs (`px` → `g` → `hsh`): gray =
    * (ascii+ascii+ascii) // 3 at the same storage offsets the engine
    * reads from the binary (x_i = 2i for w=16, y_j = ⌊12j/9⌋, byte pos =
    * 48·y + 3·x), bit j·7+i via the same comparisons. 63 bits keeps
    * `1::BIGINT << k` in range (DuckDB raises on << 63).
    */
  private val dhashCte: String = {
    val grays = (for (j <- 0 until 9; i <- 0 until 8) yield {
      val p = (j * 12 / 9) * 48 + 3 * (i * 16 / 8)
      s"(ascii(substr(s,${p + 1},1))+ascii(substr(s,${p + 2},1))+ascii(substr(s,${p + 3},1)))//3 AS g_${i}_$j"
    }).mkString(",\n    ")
    val bits = (for (j <- 0 until 9; i <- 0 until 7) yield
      s"(CASE WHEN g_${i}_$j < g_${i + 1}_$j THEN 1::BIGINT << ${j * 7 + i} ELSE 0::BIGINT END)")
      .mkString(" |\n    ")
    s"""px AS (
       |  SELECT doc_id,
       |    substr(b, 1, (48*pr)::INT) || r || substr(b, (48*pr + 49)::INT, (576 - 48*(pr+1))::INT) AS s
       |  FROM (SELECT doc_id, repeat(md5(source), 18) AS b,
       |          substr(repeat(md5(doc_id::VARCHAR), 2), 1, 48) AS r,
       |          (doc_id % 12)::BIGINT AS pr FROM documents)),
       |g AS (SELECT doc_id,
       |    $grays
       |  FROM px),
       |hsh AS (SELECT doc_id, ($bits) AS dhash FROM g)""".stripMargin
  }

  /** The 4×16-bit banding over `hsh` as a CTE (`banded`). */
  private val dhashBandedCte: String =
    """banded AS (
      |  SELECT doc_id, dhash, band, (dhash >> (16 * band)) & 65535 AS bval
      |  FROM hsh, (SELECT unnest([0, 1, 2, 3]) AS band) bands)""".stripMargin

  /** Synthesized canonical mono 16-bit PCM WAV corpus for the audio
    * fingerprint queries: data is 256 ASCII chars (128 sample frames) — a
    * base signal per `source` (repeat(md5(source), 8)) with 32-char
    * segment (doc_id % 8) overwritten by doc-specific bytes. Same-source
    * docs are near-duplicates; closed-form in (source, doc_id) so the
    * DuckDB oracle regenerates the sample STRING and never needs the
    * binary.
    */
  private def afpMedia(s: SparkSession, d: String): DataFrame = {
    import graft.ops.Multimodal
    val sg = col("doc_id") % 8
    val base = repeat(md5(col("source")), 8)
    val segStr = md5(col("doc_id").cast("string"))
    val dataStr = concat(
      base.substr(lit(1), (sg * 32).cast("int")),
      segStr,
      base.substr((sg * 32 + 33).cast("int"), (lit(256) - (sg + 1) * 32).cast("int")))
    Tables.documents(s, d).select(col("doc_id"),
      Multimodal.asMedia(
        Multimodal.wavPayloadWithData(lit(8000L), lit(1L), lit(16L),
          encode(dataStr, "UTF-8")),
        "audio/wav").as("media"))
  }

  /** The audio-fingerprint closed form as DuckDB CTEs (`pxa` → `ea` →
    * `afh`): blockAlign 2 and 128 frames make the engine's sampled frame
    * f_k = ⌊128k/64⌋ = 2k, so the 16-bit LE sample at grid point k reads
    * chars 4k+1 (low byte) and 4k+2 (high byte); ASCII data keeps every
    * sample positive, so |amp| = value. Bit k via the same comparison.
    */
  private val afpCte: String = {
    val energies = (0 until 64).map { k =>
      s"(ascii(substr(s,${4 * k + 1},1)) + 256*ascii(substr(s,${4 * k + 2},1))) AS e_$k"
    }.mkString(",\n    ")
    val bits = (0 until 63).map(k =>
      s"(CASE WHEN e_$k < e_${k + 1} THEN 1::BIGINT << $k ELSE 0::BIGINT END)")
      .mkString(" |\n    ")
    s"""pxa AS (
       |  SELECT doc_id,
       |    substr(b, 1, (32*sg)::INT) || r || substr(b, (32*sg + 33)::INT, (256 - 32*(sg+1))::INT) AS s
       |  FROM (SELECT doc_id, repeat(md5(source), 8) AS b,
       |          md5(doc_id::VARCHAR) AS r,
       |          (doc_id % 8)::BIGINT AS sg FROM documents)),
       |ea AS (SELECT doc_id,
       |    $energies
       |  FROM pxa),
       |afh AS (SELECT doc_id, ($bits) AS afp FROM ea)""".stripMargin
  }

  /** Synthesized canonical uncompressed-DIB AVI corpus (3 frames, per-doc
    * dims/timing, frame k bytes = the first rowSize·h chars of
    * repeat(md5(text‖k), 2)) — closed-form for the DuckDB oracles of the
    * video queries.
    */
  private def aviFramesMedia(s: SparkSession, d: String): DataFrame = {
    import graft.ops.Multimodal
    val w = (col("doc_id") % 4 + 1).cast("long")
    val h = (col("doc_id") % 3 + 2).cast("long")
    val us = (lit(33000L) + (col("doc_id") % 5) * 1000L).cast("long")
    val fb = floor((w * 3 + 3).cast("double") / 4.0).cast("long") * 4L * h
    val frames = (0 until 3).map(k =>
      encode(repeat(md5(concat(col("text"), lit(k.toString))), 2)
        .substr(lit(1), fb.cast("int")), "UTF-8"))
    Tables.documents(s, d).select(col("doc_id"),
      Multimodal.asMedia(
        Multimodal.aviPayloadWithFrames(w, h, us, frames), "video/avi").as("media"))
  }

  /** Keyframe-dHash closed form with PER-DOC dims: the same 63-bit gray
    * comparisons as `dhashCte`, but w/h/rowSize are row values, so every
    * sampled position is computed inside the SQL (`(h·j div 9)·rs +
    * 3·(w·i div 8)`).
    */
  private val videoKeyCte: String = {
    val grays = (for (j <- 0 until 9; i <- 0 until 8) yield {
      val pos = s"((h*$j//9)*rs + 3*(w*$i//8))"
      s"(ascii(substr(s,($pos+1)::INT,1))+ascii(substr(s,($pos+2)::INT,1))+ascii(substr(s,($pos+3)::INT,1)))//3 AS g_${i}_$j"
    }).mkString(",\n    ")
    val bits = (for (j <- 0 until 9; i <- 0 until 7) yield
      s"(CASE WHEN g_${i}_$j < g_${i + 1}_$j THEN 1::BIGINT << ${j * 7 + i} ELSE 0::BIGINT END)")
      .mkString(" |\n    ")
    s"""vfx AS (
       |  SELECT doc_id, w, h, rs,
       |    substr(repeat(md5(text || '0'), 2), 1, (rs * h)::INT) AS s
       |  FROM (SELECT doc_id, text,
       |          (doc_id % 4 + 1)::BIGINT AS w, (doc_id % 3 + 2)::BIGINT AS h,
       |          ((doc_id % 4 + 1) * 3 + 3) // 4 * 4 AS rs FROM documents)),
       |vg AS (SELECT doc_id,
       |    $grays
       |  FROM vfx),
       |vkh AS (SELECT doc_id, ($bits) AS dhash FROM vg)""".stripMargin
  }

  private val afpBandedCte: String =
    """abanded AS (
      |  SELECT doc_id, afp, band, (afp >> (16 * band)) & 65535 AS bval
      |  FROM afh, (SELECT unnest([0, 1, 2, 3]) AS band) bands)""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // snapshot diff: orders vs a deterministically mutated copy — %97 keys
    // removed, %101 keys re-added under shifted ids, %13 prices bumped
    "cdc_snapshot_diff" -> ((s, d) => {
      val o = Tables.orders(s, d).select("o_orderkey", "o_orderstatus", "o_totalprice")
      val newSnap = o.filter(pmod(col("o_orderkey"), lit(97)) =!= 0)
        .withColumn("o_totalprice",
          when(pmod(col("o_orderkey"), lit(13)) === 0, col("o_totalprice") + 1.0)
            .otherwise(col("o_totalprice")))
        .unionByName(o.filter(pmod(col("o_orderkey"), lit(101)) === 0)
          .withColumn("o_orderkey", col("o_orderkey") + 10000000L))
      graft.ops.Cdc.snapshotDiff(o, newSnap, "o_orderkey")
    }),

    // Morton key for 2-dim layout clustering; the full write-side lever is
    // Layout.clusterByZOrder2 (LayoutSpec proves the bounding-box win)
    "layout_zorder" -> ((s, d) =>
      Tables.lineitem(s, d).select(col("l_orderkey"), col("l_linenumber"),
        graft.ops.Layout.zOrderKey2(
          pmod(col("l_partkey"), lit(4096)),
          pmod(col("l_suppkey"), lit(4096)), bits = 12).as("zkey"))),

    // Hilbert index for the same 2-dim clustering (strictly tighter
    // locality than Morton — consecutive keys are always adjacent cells);
    // write-side lever is Layout.clusterByHilbert2
    "layout_hilbert" -> ((s, d) =>
      graft.ops.Layout.withHilbertKey2(
        Tables.lineitem(s, d).select(col("l_orderkey"), col("l_linenumber"),
          pmod(col("l_partkey"), lit(4096)).as("__px"),
          pmod(col("l_suppkey"), lit(4096)).as("__py")),
        col("__px"), col("__py"), bits = 12, out = "hkey")
        .select("l_orderkey", "l_linenumber", "hkey")),

    // re-identification audits over the release's QI columns (lang, source)
    // — k=5 / l=3 chosen so the sf corpus exercises BOTH outcomes
    "privacy_k_anon" -> ((s, d) =>
      graft.ops.Privacy.kAnonymityClasses(
        Tables.documents(s, d), Seq("lang", "source"), k = 5)),
    "privacy_l_div" -> ((s, d) =>
      graft.ops.Privacy.lDiversityClasses(
        Tables.documents(s, d), Seq("lang", "source"), "n_chars", l = 3)),
    "privacy_suppress" -> ((s, d) =>
      graft.ops.Privacy.suppressUnderK(
        Tables.documents(s, d).select(col("doc_id"), col("lang"), col("source")),
        Seq("lang", "source"), k = 5)),

    // one-pass per-column profile; exact NDV here so the oracle can match
    // (the engine default is the HLL sketch — see ProfileSpec)
    "profile_columns" -> ((s, d) =>
      graft.ops.Profile.columns(Tables.orders(s, d),
        Seq("o_orderkey", "o_custkey", "o_orderstatus", "o_orderpriority", "o_totalprice"),
        approxDistinct = false)),

    // Deequ-style expectation suite in one aggregation pass: the
    // pre-training data-quality gate (completeness, consistency, domain,
    // drift thresholds). min_length_200 intentionally carries a 90% bar
    // the corpus misses, so both `passed` states flow through the oracle.
    "quality_expectations" -> ((s, d) => {
      import graft.ops.Profile.Expectation
      graft.ops.Profile.expectations(Tables.documents(s, d), Seq(
        Expectation("text_present", length(col("text")) > 0),
        Expectation("n_chars_consistent", col("n_chars") === length(col("text"))),
        Expectation("lang_known",
          col("lang").isInCollection(Seq("en", "de", "fr", "es", "zh"))),
        Expectation("source_format", col("source").rlike("^src[0-9]+$")),
        Expectation("min_length_200", length(col("text")) >= 200, minPassFrac = 0.9)))
    }),

    // U1: scalar UDF applied through the SQL surface
    "u1_scalar_udf" -> ((s, d) => {
      Udfs.register(s)
      Tables.events(s, d).createOrReplaceTempView("events_u1")
      s.sql("SELECT event_id, title_case(event_type) AS evt FROM events_u1")
    }),

    // U2: typed Aggregator UDAF (sum of squares; integral doubles → exact)
    "u2_udaf_sumsq" -> ((s, d) => {
      Udfs.register(s)
      Tables.lineitem(s, d).createOrReplaceTempView("lineitem_u2")
      s.sql("""SELECT l_returnflag, sumsq(l_quantity) AS sq, count(*) AS cnt
              |FROM lineitem_u2 GROUP BY l_returnflag""".stripMargin)
    }),

    // U3: UDTF surface = generator (posexplode) over an array expression
    "u3_udtf_posexplode" -> ((s, d) =>
      Tables.documents(s, d)
        .select(col("doc_id"), Text.tokens(col("text")).as("toks"))
        .select(col("doc_id"), posexplode(col("toks")).as(Seq("pos", "token")))),

    // P2: flatMapValues — 1→N values, key KEPT (ref KafkaWordCount.java:61-62)
    "p2_flatmap_values" -> ((s, d) =>
      Tables.documents(s, d)
        .select(col("doc_id"), Text.tokens(col("text")).as("toks"))
        .select(col("doc_id"), explode(col("toks")).as("word"))),

    // P4: selectKey — rekey only (ref StreamStreamJoinIntegrationTest.java:111)
    "p4_select_key" -> ((s, d) =>
      Tables.events(s, d).select(
        col("event_type").as("ROWKEY"), col("event_id"), col("value"))),

    // J3: full-outer windowed join batch twin
    "j3_window_outer_join" -> ((s, d) => {
      val e = Tables.events(s, d).withColumn("ts_us", expr("ts_ns div 1000"))
      val c = e.filter(col("event_type") === "click")
        .select(col("user_id").as("c_user"), col("event_id").as("click_id"), col("ts_us").as("cts"))
      val p = e.filter(col("event_type") === "purchase")
        .select(col("user_id").as("p_user"), col("event_id").as("purchase_id"), col("ts_us").as("pts"))
      c.join(p, col("c_user") === col("p_user") &&
          col("pts") >= col("cts") - windowUs && col("pts") <= col("cts") + windowUs, "full_outer")
        .select(coalesce(col("c_user"), col("p_user")).as("user_id"),
          col("click_id"), col("purchase_id"))
    }),

    // Multimodal: opaque binary payload + metadata (byte length, sha256)
    "mm_binary_meta" -> ((s, d) =>
      Tables.documents(s, d).select(
        col("doc_id"),
        length(encode(col("text"), "UTF-8")).cast("long").as("n_bytes"),
        sha2(encode(col("text"), "UTF-8"), 256).as("sha"))),

    // Multimodal REAL header decode: synthesize valid BMP/PNG/WAV headers
    // per doc (dims/rate are closed-form in doc_id), parse them back with
    // graft.ops.Multimodal.headerMeta; the oracle states the closed form —
    // any mis-parsed offset/endianness breaks the hash
    "mm_header_meta" -> ((s, d) => {
      import graft.ops.Multimodal
      val w = (col("doc_id") % 1024 + 1).cast("long")
      val h = (col("doc_id") % 768 + 1).cast("long")
      val sr = (lit(8000L) + (col("doc_id") % 5) * 8000L).cast("long")
      val payload = when(col("doc_id") % 3 === 0, Multimodal.bmpPayload(w, h))
        .when(col("doc_id") % 3 === 1, Multimodal.pngPayload(w, h))
        .otherwise(Multimodal.wavPayload(sr, lit(2L), lit(16L)))
      Tables.documents(s, d)
        .select(col("doc_id"), Multimodal.headerMeta(payload).as("m"))
        .select(col("doc_id"), col("m.fmt").as("fmt"), col("m.width").as("width"),
          col("m.height").as("height"), col("m.sample_rate").as("sample_rate"),
          col("m.channels").as("channels"), col("m.duration_ms").as("duration_ms"))
    }),

    // REAL audio windowing: synthesize per-doc PCM WAV payloads (ASCII
    // data = repeated md5(text), so the oracle's character substring IS
    // byte slicing), split into 2 ms training windows by pure header
    // arithmetic, hash each window's sample bytes
    "mm_audio_windows" -> ((s, d) => {
      import graft.ops.Multimodal
      val sr = (lit(8000L) + (col("doc_id") % 5) * 8000L)
      val data = encode(repeat(md5(col("text")), (col("doc_id") % 7 + 4).cast("int")), "UTF-8")
      val media = Tables.documents(s, d).select(col("doc_id"),
        Multimodal.asMedia(
          Multimodal.wavPayloadWithData(sr, lit(1L), lit(16L), data),
          "audio/wav").as("media"))
      Multimodal.audioWindows(media, "doc_id", "media", windowMs = 2)
        .select(col("doc_id"), col("window_idx"), col("start_ms"), col("n_bytes"),
          sha2(col("samples"), 256).as("sha"))
    }),

    // REAL image tiling: synthesize per-doc 24bpp BMPs (ASCII pixel
    // array sized exactly rowSize·h), band into 3-row tiles by header
    // arithmetic, hash each band's bytes
    "mm_image_bands" -> ((s, d) => {
      import graft.ops.Multimodal
      val w = (col("doc_id") % 5 + 1).cast("long")
      val h = (col("doc_id") % 9 + 2).cast("long")
      val rs = floor((w * 3 + 3).cast("double") / 4.0).cast("long") * 4L
      val dataStr = repeat(md5(col("text")), 6).substr(lit(1), (rs * h).cast("int"))
      val media = Tables.documents(s, d).select(col("doc_id"),
        Multimodal.asMedia(
          Multimodal.bmpPayloadWithData(w, h, encode(dataStr, "UTF-8")),
          "image/bmp").as("media"))
      Multimodal.imageBands(media, "doc_id", "media", bandRows = 3)
        .select(col("doc_id"), col("band_idx"), col("row0"), col("n_rows"),
          sha2(col("band"), 256).as("sha"))
    }),

    // REAL perceptual hashing: synthesize 16×12 24bpp BMPs whose pixel
    // array is closed-form in (source, doc_id) — base image per source,
    // one doc-specific storage row overwritten — then dHash the BINARY
    // through the real header/stride/pixel arithmetic. The oracle computes
    // the same 63 bits from the generative closed form WITHOUT ever
    // building a BMP (ascii() on the data string), so any off-by-one in
    // offset/stride/endianness on the Spark side breaks the hash match.
    "mm_image_dhash" -> ((s, d) =>
      graft.ops.Multimodal.dHash(dhashMedia(s, d), "doc_id", "media")),

    // REAL nearest-neighbor resize (native graft_resize — one expression
    // node, not w2·h2 staged substrs): 16×12 → 8×6 picks source pixel
    // (2i, 2j). 8×6 has a pad-free 24-byte stride, so the ASCII pixel
    // array decodes to a string and the oracle replays EVERY output byte
    // from the closed-form source image, plus the parsed-back header dims
    // and total payload length.
    "mm_image_resize" -> ((s, d) => {
      val rp = graft.functions.Native.resizeBmp(col("media.payload"), 8, 6)
      dhashMedia(s, d).select(col("doc_id"), rp.as("rp"))
        .select(col("doc_id"),
          graft.ops.Multimodal.headerMeta(col("rp")).getField("width").as("w"),
          graft.ops.Multimodal.headerMeta(col("rp")).getField("height").as("h"),
          length(col("rp")).cast("long").as("plen"),
          decode(substring(col("rp"), 55, 144), "UTF-8").as("pix"))
    }),

    // image near-dup pairs over the same corpus: banded Hamming equi-join
    // (never all-pairs), hot-band guard pinned explicitly OFF here (the
    // unthinned declared form) — the cap=1 twin below fires the stride
    "mm_image_neardup_pairs" -> ((s, d) =>
      graft.ops.Multimodal.imageNearDupPairs(dhashMedia(s, d), "doc_id", "media",
        maxHamming = 6, maxBucket = Int.MaxValue)),
    "mm_image_neardup_thinned" -> ((s, d) =>
      graft.ops.Multimodal.imageNearDupPairs(dhashMedia(s, d), "doc_id", "media",
        maxHamming = 6, maxBucket = 1)),
    "mm_image_neardup_kept" -> ((s, d) =>
      graft.ops.Multimodal.dropNearDupImages(dhashMedia(s, d), "doc_id", "media",
        maxHamming = 6, maxBucket = Int.MaxValue)
        .select("doc_id")),

    // REAL audio fingerprinting over the same discipline as mm_image_dhash:
    // 64-point temporal-envelope sample of real PCM bytes through the real
    // header arithmetic; the oracle recomputes all 63 bits from the
    // generative closed form
    "mm_audio_fp" -> ((s, d) =>
      graft.ops.Multimodal.audioFingerprint(afpMedia(s, d), "doc_id", "media")),

    // audio near-dup pairs via the SHARED bandedHammingPairs machinery
    // (guard pinned off here — the image cap=1 twin fires the stride for
    // the shared code path)
    "mm_audio_neardup_pairs" -> ((s, d) =>
      graft.ops.Multimodal.audioNearDupPairs(afpMedia(s, d), "doc_id", "media",
        maxHamming = 10, maxBucket = Int.MaxValue)),
    "mm_audio_neardup_kept" -> ((s, d) =>
      graft.ops.Multimodal.dropNearDupAudio(afpMedia(s, d), "doc_id", "media",
        maxHamming = 10, maxBucket = Int.MaxValue)
        .select("doc_id")),

    // REAL video header decode: canonical AVI avih fields (dims, frame
    // timing) parsed back by the same headerMeta that owns BMP/PNG/WAV —
    // the oracle states the closed form, so any mis-parsed offset breaks it
    "mm_video_meta" -> ((s, d) => {
      import graft.ops.Multimodal
      val payload = Multimodal.aviPayload(
        (col("doc_id") % 640 + 1).cast("long"),
        (col("doc_id") % 480 + 1).cast("long"),
        lit(33333L), (col("doc_id") % 100).cast("long"))
      Tables.documents(s, d)
        .select(col("doc_id"), Multimodal.headerMeta(payload).as("m"))
        .select(col("doc_id"), col("m.fmt").as("fmt"), col("m.width").as("width"),
          col("m.height").as("height"), col("m.duration_ms").as("duration_ms"))
    }),

    // REAL video frame extraction: synthesize canonical uncompressed-DIB
    // AVIs (3 frames, per-doc dims and timing, ASCII frame bytes), slice
    // by pure container arithmetic, hash each frame's bytes
    "mm_video_frames" -> ((s, d) =>
      graft.ops.Multimodal.videoFrames(aviFramesMedia(s, d), "doc_id", "media")
        .select(col("doc_id"), col("frame_idx"), col("t_ms"), col("n_bytes"),
          sha2(col("frame"), 256).as("sha"))),

    // keyframe dHash over the same AVI corpus — the video near-dup
    // signature: frame 0 sliced, wrapped into a real BMP, hashed through
    // the exact image pipeline; the oracle recomputes the 63 bits with
    // PER-DOC dims (w,h,rowSize as row values inside the gray positions)
    "mm_video_keyframe_dhash" -> ((s, d) =>
      graft.ops.Multimodal.videoKeyframeHash(aviFramesMedia(s, d), "doc_id", "media")),

    // video near-dup removal — keyframe hashes through the SAME shared
    // bandedHammingPairs machinery (guard pinned off; the image cap=1
    // twin fires the stride for the shared path). The tiny-dim corpus is
    // collision-dense by construction, so BOTH keeper outcomes flow
    // through the oracle (23 kept / 477 dropped at sf0.01)
    "mm_video_neardup_kept" -> ((s, d) =>
      graft.ops.Multimodal.dropNearDupVideos(aviFramesMedia(s, d), "doc_id", "media",
        maxHamming = 6, maxBucket = Int.MaxValue)
        .select("doc_id")),

    // P11: format-conversion round-trip — Avro-encode the rows to binary,
    // decode back; identity result proves the codec loses nothing
    // (ref StreamsSelectAndProjectIntTest.java:267-287, Avro↔JSON CSAS)
    "p11_format_roundtrip" -> ((s, d) => {
      val src = Tables.documents(s, d).select("doc_id", "text")
      graft.serde.AvroCodec.decode(
        graft.serde.AvroCodec.encode(src, Seq("doc_id", "text")), "value", src.schema)
    }),

    // J4: rekey-before-join invariance — both sides rekeyed through a
    // derived string key (selectKey analogue) must produce exactly the
    // unrekeyed J1 result; the oracle IS the plain-key join
    // (ref StreamStreamJoinIntegrationTest.java:88-115 testInnerRepartitioned)
    "j4_rekeyed_join" -> ((s, d) => {
      val e = Tables.events(s, d).withColumn("ts_us", expr("ts_ns div 1000"))
      val c = e.filter(col("event_type") === "click")
        .select(concat(lit("u"), col("user_id")).as("k"),
          col("user_id"), col("event_id").as("click_id"), col("ts_us").as("cts"))
      val p = e.filter(col("event_type") === "purchase")
        .select(concat(lit("u"), col("user_id")).as("k2"),
          col("event_id").as("purchase_id"), col("ts_us").as("pts"))
      c.join(p, col("k") === col("k2") &&
          col("pts") >= col("cts") - windowUs && col("pts") <= col("cts") + windowUs)
        .select(col("user_id"), col("click_id"), col("purchase_id"),
          (col("pts") - col("cts")).as("lag_us"))
    }),

    // S5/S9: JSON-with-embedded-schema (Connect JsonConverter
    // schemas.enable=true) encode→decode identity
    "s5_json_envelope_roundtrip" -> ((s, d) => {
      import org.apache.spark.sql.types._
      val payloadSchema = StructType(Seq(
        StructField("doc_id", LongType), StructField("lang", StringType)))
      Tables.documents(s, d)
        .select(graft.serde.Serdes.toJsonEnvelope(
          struct(col("doc_id"), col("lang")), payloadSchema).as("env"))
        .select(graft.serde.Serdes.fromJsonEnvelope(col("env"), payloadSchema).as("p"))
        .select(col("p.doc_id").as("doc_id"), col("p.lang").as("lang"))
    }),

    // S9: delimited codec encode→decode identity (KSQL DELIMITED format)
    "s9_delimited_roundtrip" -> ((s, d) => {
      import org.apache.spark.sql.types._
      val schema = StructType(Seq(StructField("event_id", LongType),
        StructField("user_id", LongType), StructField("event_type", StringType)))
      val encoded = Tables.events(s, d).select(graft.serde.Serdes.toDelimited(
        "|", col("event_id"), col("user_id"), col("event_type")).as("line"))
      graft.serde.Serdes.fromDelimited(encoded, "line", "|", schema)
    }),

    // S10: per-topic routing / merged consumption — two differently-shaped
    // "topics" unioned by name, missing columns null-filled
    // (ref WrappedConsumer.poll:103-115 merges Kafka + Connect sources)
    "s10_union_routing" -> ((s, d) => {
      val e = Tables.events(s, d)
      val clicks = e.filter(col("event_type") === "click")
        .select(col("event_id"), col("user_id"), col("value").as("click_val"))
      val purchases = e.filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("value").as("purch_val"))
      graft.api.Topology.unionSources(Seq(clicks, purchases))
    }),

    // S11: SMT chain — mask key, derive a column, drop records; the chain
    // is function composition Catalyst fuses into one stage
    // (ref ConnectSourceConsumer.java:259-264, null result drops the record)
    "s11_smt_chain" -> ((s, d) => {
      import graft.api.Topology
      val maskKey: Topology.Transform =
        df => df.withColumn("user_mask", Text.h32(col("user_id").cast("string")))
          .drop("user_id")
      val deriveBucket: Topology.Transform =
        df => df.withColumn("value_bucket", (floor(col("value") / 50) * 50).cast("long"))
      val dropViews: Topology.Transform = df => df.filter(col("event_type") =!= "view")
      Topology.smtChain(maskKey, deriveBucket, dropViews)(Tables.events(s, d))
        .select("event_id", "event_type", "user_mask", "value_bucket")
    }),

    // Skew: two-phase salted aggregation — a hot group key spread over 8
    // reducers, re-merged; oracle is the PLAIN group-by (the rewrite must
    // be semantics-preserving). Decimal sums keep both phases exact.
    "skew_salted_agg" -> ((s, d) => {
      val e = Tables.events(s, d).withColumn("v", col("value").cast("decimal(18,2)"))
      graft.ops.Skew.saltedAgg(e, "event_type", "event_id", salts = 8, ("v", "v"))
        .select(col("event_type"), col("cnt"), col("v").cast("double").as("v"))
    }),

    // Misra-Gries heavy hitters: mergeable k-bounded frequent-items sketch
    // (shuffle = k counters per partition, never one row per distinct
    // item). event_type has 5 distinct values < k=64, so no decrement ever
    // fires and the sketch is EXACT → the oracle is the plain group-by
    // count; the eviction-mode error bounds are FreqItemsSpec properties.
    "freq_heavy_hitters" -> ((s, d) =>
      Tables.events(s, d)
        .agg(graft.functions.FreqItems.heavyHitters(64)(col("event_type")).as("hh"))
        .select(explode(col("hh")).as(Seq("item", "cnt")))),

    // Mergeable KLL quantile sketches (native TypedImperativeAggregate,
    // the HllSketchAgg pattern): per-source doc-length distribution. While
    // a group has seen ≤ k=1024 values the sketch retains all of them and
    // every INCLUSIVE-rank quantile is EXACT — at sf0.01 each source is
    // far below capacity, so the DuckDB cume_dist oracle pins the whole
    // build→probe chain (the freq_heavy_hitters exact-regime trick); the
    // compaction-regime error envelope is an ApproxSpec property.
    "sketch_quantiles" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      graft.ops.Sketches.rollupQuantiles(
        graft.ops.Sketches.quantileSketches(docs, Seq("source"), "n_chars"),
        Seq("source"), Seq(0.5, 0.9, 0.99))
    }),

    // The rollup side under the same oracle: build finer-grained sketches
    // per (source, lang), MERGE them to one global sketch (graft_kll_merge
    // over the serialized images — the persisted-artifact path ApproxSpec
    // drives through parquet), and probe. Total corpus ≤ k at sf0.01 →
    // the merge is provably lossless: global quantiles from merged
    // per-group sketches must equal DuckDB's cume_dist over the raw rows.
    "sketch_quantiles_rollup" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      graft.ops.Sketches.rollupQuantiles(
        graft.ops.Sketches.quantileSketches(docs, Seq("source", "lang"), "n_chars"),
        Seq.empty, Seq(0.25, 0.5, 0.75, 0.95))
    }),

    // The sketch USED in a curation pipeline (no collect anywhere): KLL
    // per-source length thresholds (p05/p95, exact at this SF) broadcast-
    // joined back onto the corpus, keep docs inside the band — the
    // outlier-trim step every length-filtered training corpus runs. At
    // 100 TB the threshold frame is |sources| rows (one sketch each), so
    // the second pass is scan + broadcast filter, no extra shuffle.
    "sketch_quantile_trim" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val th = graft.ops.Sketches.rollupQuantiles(
        graft.ops.Sketches.quantileSketches(docs, Seq("source"), "n_chars"),
        Seq("source"), Seq(0.05, 0.95))
      docs.join(broadcast(th), "source")
        .filter(col("n_chars") >= col("q_5") && col("n_chars") <= col("q_95"))
        .groupBy("source")
        .agg(count(lit(1)).as("kept"),
          min("n_chars").as("min_kept"), max("n_chars").as("max_kept"))
    }),

    // Theta sketches: the set-operation-capable distinct sketch (HLL only
    // unions; overlap questions need intersect/difference). Contamination
    // report — distinct normalized-text fingerprints shared between the
    // training shard and the held-out benchmark shard (every 50th doc, the
    // decontam_* split). Each side collapses to ONE ≤128 KB sketch via
    // map-side partial agg; a theta sketch is exact while ≤ 2^lgK=16k
    // distincts, far above sf0.01's 500 docs, so the DuckDB
    // INTERSECT/EXCEPT oracle pins all six estimates value-for-value; the
    // sampling-regime error envelope is an ApproxSpec property.
    "sketch_theta_contam" -> ((s, d) => {
      val dd = Tables.documents(s, d).select(col("doc_id"),
        md5(regexp_replace(lower(col("text")), "\\s+", " ")).as("fp"))
      graft.ops.Sketches.corpusOverlap(
        dd.filter(pmod(col("doc_id"), lit(50)) =!= 0),
        dd.filter(pmod(col("doc_id"), lit(50)) === 0), "fp")
    }),

    // N-ary intersection: vocabulary present in EVERY source's docs —
    // per-source token sketches, then one intersect-agg (and the union
    // merge alongside): |sources| sketch rows into the final agg, never
    // a (source × token) recount. Exact regime at this SF → plain
    // GROUP BY/HAVING oracle.
    "sketch_theta_core_vocab" -> ((s, d) => {
      val toks = Tables.documents(s, d)
        .select(col("source"),
          explode(split(lower(col("text")), "\\W+")).as("tok"))
        .filter(length(col("tok")) > 0)
      graft.ops.Sketches.overlapSketches(toks, Seq("source"), "tok")
        .agg(
          graft.functions.Native.thetaEstimate(
            graft.functions.Native.thetaIntersectAgg(col("tsketch"))).as("core_vocab"),
          graft.functions.Native.thetaEstimate(
            graft.functions.Native.thetaMerge(col("tsketch"))).as("total_vocab"),
          count(lit(1)).as("n_sources"))
    }),

    // Lakehouse maintenance (ops/Lakehouse): one deterministic upsert
    // batch (price bumps %97, inserted keys %131 → +100000000 as 'X-NEW',
    // tombstones %113), applied three ways that must agree with one SQL
    // truth. COW rewrites only touched shard directories; MOR appends
    // deltas and reconciles at read; compaction folds MOR back to a base.
    "lake_cow_upsert" -> ((s, d) => {
      import graft.ops.Lakehouse
      val path = lakePath("orders_cow", d)
      val src = Tables.orders(s, d)
        .select("o_orderkey", "o_orderpriority", "o_totalprice")
      Lakehouse.writeShardedOnce(src, path, "o_orderkey", 16)
      Lakehouse.upsertSharded(s, path, "o_orderkey", 16,
        cowBatch(src), "_v", "_deleted")
      Lakehouse.readSharded(s, path)
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n"),
          sum(col("o_totalprice").cast("decimal(18,2)")).cast("double").as("total"))
    }),

    "lake_mor_view" -> ((s, d) => {
      import graft.ops.Lakehouse
      val src = Tables.orders(s, d)
        .select("o_orderkey", "o_orderpriority", "o_totalprice")
      Lakehouse.morView(src, morDeltas(src), "o_orderkey", "_v", "_deleted")
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n"),
          sum(col("o_totalprice").cast("decimal(18,2)")).cast("double").as("total"))
    }),

    // compaction: same deltas folded into a fresh sharded base — the
    // reconciled-read and the compacted-base answers share ONE oracle
    "lake_compact_equiv" -> ((s, d) => {
      import graft.ops.Lakehouse
      val src = Tables.orders(s, d)
        .select("o_orderkey", "o_orderpriority", "o_totalprice")
      val path = lakePath("orders_compacted", d)
      Lakehouse.compactTo(
        Lakehouse.morView(src, morDeltas(src), "o_orderkey", "_v", "_deleted"),
        path, "o_orderkey", 16)
      Lakehouse.readSharded(s, path)
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n"),
          sum(col("o_totalprice").cast("decimal(18,2)")).cast("double").as("total"))
    }),

    // the change feed OF a lakehouse upsert: snapshotDiff(pristine,
    // post-upsert state) classifies every key — the audit artifact (and
    // incremental-refresh input) a maintained corpus emits per apply.
    // Shares the COW path with lake_cow_upsert; both are idempotent, so
    // either execution order converges to the same state.
    "lake_change_feed" -> ((s, d) => {
      import graft.ops.{Cdc, Lakehouse}
      val src = Tables.orders(s, d)
        .select("o_orderkey", "o_orderpriority", "o_totalprice")
      val path = lakePath("orders_cow", d)
      Lakehouse.writeShardedOnce(src, path, "o_orderkey", 16)
      Lakehouse.upsertSharded(s, path, "o_orderkey", 16,
        cowBatch(src), "_v", "_deleted")
      Cdc.snapshotDiff(src, Lakehouse.readSharded(s, path), "o_orderkey")
    }),

    // time travel: the corpus as of version 1 — only the v1 deltas
    // applied, reconstructed from the append-only delta log (the
    // reproducible-training-snapshot read: "corpus@v1" stays answerable
    // after v2 landed)
    "lake_time_travel" -> ((s, d) => {
      import graft.ops.Lakehouse
      val src = Tables.orders(s, d)
        .select("o_orderkey", "o_orderpriority", "o_totalprice")
      Lakehouse.asOf(src, morDeltas(src), "o_orderkey", "_v", "_deleted", 1L)
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n"),
          sum(col("o_totalprice").cast("decimal(18,2)")).cast("double").as("total"))
    }),

    // incremental view maintenance: the persisted (group, count, sum)
    // aggregate refreshed from the upsert's change feed — retract old
    // images, add new ones — WITHOUT rescanning the base. Shares
    // lake_cow_upsert's oracle: one truth, two strategies (full
    // re-aggregation vs O(|changes| + |groups|) maintenance). Decimal
    // arithmetic end-to-end so retraction is exact.
    "lake_incr_stats" -> ((s, d) => {
      import graft.ops.{Cdc, Lakehouse}
      val dec = "decimal(18,2)"
      val src = Tables.orders(s, d)
        .select(col("o_orderkey"), col("o_orderpriority"),
          col("o_totalprice").cast(dec).as("o_totalprice"))
      val stats0 = src.groupBy(col("o_orderpriority").as("g"))
        .agg(count(lit(1)).as("n"), sum("o_totalprice").as("s"))
      val finalState = Lakehouse.morView(src,
        cowBatch(src, c => (c + lit(1000).cast(dec)).cast(dec)),
        "o_orderkey", "_v", "_deleted")
      val feed = Cdc.snapshotDiffImages(src, finalState, "o_orderkey")
        .filter(col("change") =!= "unchanged")
      Cdc.refreshGroupStats(stats0, feed, "o_orderpriority", "o_totalprice")
        .select(col("g").as("o_orderpriority"), col("n"),
          col("s").cast("double").as("total"))
    }),

    // Incremental curation — the "process the delta, not the corpus"
    // discipline: a new crawl batch (doc_id %10 == 0) is quality-gated,
    // deduped within itself, deduped against the PERSISTED corpus state's
    // fingerprint index (never rescanning corpus text — at 100 TB the
    // index is 16 bytes/doc, the texts are the 100 TB), and upserted into
    // the sharded lakehouse corpus. Replaying the batch is a no-op (its
    // fingerprints are in the index after the first apply), so the final
    // state this query reports is run-count-invariant.
    "lake_incr_curate" -> ((s, d) => {
      import graft.ops.Lakehouse
      val all = Tables.documents(s, d).select(col("doc_id"), col("text"),
          col("source"))
        .withColumn("fp", md5(col("text")))
        .withColumn("n_tokens", size(Text.tokens(col("text"))).cast("long"))
        .drop("text")
      val path = lakePath("corpus_incr", d)
      Lakehouse.writeShardedOnce(all.filter(col("doc_id") % 10 =!= 0),
        path, "doc_id", 16)

      val batch = all.filter(col("doc_id") % 10 === 0 && col("n_tokens") >= 10)
      val firstPerFp = batch.groupBy("fp").agg(min(col("doc_id")).as("doc_id"))
      val index = Lakehouse.readSharded(s, path).select("fp").distinct()
      val kept = batch.join(firstPerFp, Seq("fp", "doc_id"), "left_semi")
        .join(index, Seq("fp"), "left_anti")
        .withColumn("_v", lit(1L)).withColumn("_deleted", lit(false))
      Lakehouse.upsertSharded(s, path, "doc_id", 16, kept, "_v", "_deleted")

      Lakehouse.readSharded(s, path)
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_tokens")).as("total_tokens"))
    }),

    // A4: emission-granularity equivalence batch twin — word counts built
    // from per-batch partial counts re-aggregated (caching/coalesced
    // emission) must equal the single-pass count (per-record emission)
    // (ref KafkaWordCount.java:50 CACHE_MAX_BYTES_BUFFERING_CONFIG=0,
    // AbstractJoinIntegrationTest.java:73-79 parameterized cache on/off)
    "a4_incremental_equiv" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val batches = (0 to 1).map { b =>
        Text.wordCount(docs.filter(pmod(col("doc_id"), lit(2)) === b), "text")
      }
      batches.reduce(_ unionByName _)
        .groupBy("word").agg(sum(col("cnt")).as("cnt"))
    }))

  /** Per-(table, sf-dir) lakehouse path so fixtures never alias. */
  private def lakePath(base: String, sfDir: String): String =
    java.nio.file.Paths.get(System.getProperty("java.io.tmpdir"),
      "graft_lake",
      s"${base}_${sfDir.replaceAll("[^A-Za-z0-9]", "_")}").toString

  /** The COW upsert batch, derived from the PRISTINE source so replaying
    * it is idempotent (re-running Verify/Bench against an already-upserted
    * base reconverges to the same state): price bumps for %97 keys (minus
    * the tombstoned ones so one batch never carries conflicting rows for
    * a key), inserts under fresh keys for %131, tombstones for %113.
    */
  private def cowBatch(src: DataFrame,
      bump: Column => Column = _ + 1000.0): DataFrame = {
    val bumps = src
      .filter(col("o_orderkey") % 97 === 0 && col("o_orderkey") % 113 =!= 0)
      .withColumn("o_totalprice", bump(col("o_totalprice")))
      .withColumn("_v", lit(1L)).withColumn("_deleted", lit(false))
    val inserts = src.filter(col("o_orderkey") % 131 === 0)
      .withColumn("o_orderkey", col("o_orderkey") + 100000000L)
      .withColumn("o_orderpriority", lit("X-NEW"))
      .withColumn("_v", lit(1L)).withColumn("_deleted", lit(false))
    val tombstones = src.filter(col("o_orderkey") % 113 === 0)
      .withColumn("_v", lit(1L)).withColumn("_deleted", lit(true))
    bumps.unionByName(inserts).unionByName(tombstones)
  }

  /** Two MOR delta generations: v1 bumps (+1000, %97) and v1 tombstones
    * (%113), then v2 re-bumps (+1500 replacing, %194) — v2 also
    * RESURRECTS any %113 key it covers (later version beats tombstone).
    */
  private def morDeltas(src: DataFrame): DataFrame = {
    val v1bump = src.filter(col("o_orderkey") % 97 === 0)
      .withColumn("o_totalprice", col("o_totalprice") + 1000.0)
      .withColumn("_v", lit(1L)).withColumn("_deleted", lit(false))
    val v1tomb = src.filter(col("o_orderkey") % 113 === 0)
      .withColumn("_v", lit(1L)).withColumn("_deleted", lit(true))
    val v2bump = src.filter(col("o_orderkey") % 194 === 0)
      .withColumn("o_totalprice", col("o_totalprice") + 1500.0)
      .withColumn("_v", lit(2L)).withColumn("_deleted", lit(false))
    v1bump.unionByName(v1tomb).unionByName(v2bump)
  }

  private val toks =
    """list_filter(string_split_regex(lower(text), '\W+'), x -> length(x) > 0)"""

  val oracle: Map[String, String] = Map(
    "cdc_snapshot_diff" ->
      """WITH o AS (SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders),
        |n AS (
        |  SELECT o_orderkey, o_orderstatus,
        |         CASE WHEN o_orderkey % 13 = 0 THEN o_totalprice + 1.0
        |              ELSE o_totalprice END AS o_totalprice
        |  FROM o WHERE o_orderkey % 97 <> 0
        |  UNION ALL
        |  SELECT o_orderkey + 10000000, o_orderstatus, o_totalprice
        |  FROM o WHERE o_orderkey % 101 = 0)
        |SELECT coalesce(o.o_orderkey, n.o_orderkey) AS o_orderkey,
        |  CASE WHEN o.o_orderkey IS NULL THEN 'added'
        |       WHEN n.o_orderkey IS NULL THEN 'removed'
        |       WHEN o.o_orderstatus IS NOT DISTINCT FROM n.o_orderstatus
        |        AND o.o_totalprice IS NOT DISTINCT FROM n.o_totalprice THEN 'unchanged'
        |       ELSE 'changed' END AS change
        |FROM o FULL OUTER JOIN n ON o.o_orderkey = n.o_orderkey""".stripMargin,

    "layout_zorder" ->
      s"""SELECT l_orderkey, l_linenumber,
         |  ${graft.ops.Layout.zOrderSql2("(l_partkey % 4096)", "(l_suppkey % 4096)", 12)} AS zkey
         |FROM lineitem""".stripMargin,

    "layout_hilbert" -> graft.ops.Layout.hilbertSql2(
      "lineitem", Seq("l_orderkey", "l_linenumber"),
      "l_partkey % 4096", "l_suppkey % 4096", 12, "hkey"),

    "privacy_k_anon" ->
      """SELECT lang, source, count(*) AS class_size, count(*) >= 5 AS is_k_anon
        |FROM documents GROUP BY lang, source""".stripMargin,

    "privacy_l_div" ->
      """SELECT lang, source, count(*) AS n_sensitive, count(*) >= 3 AS is_l_diverse
        |FROM (SELECT DISTINCT lang, source, n_chars FROM documents)
        |GROUP BY lang, source""".stripMargin,

    "privacy_suppress" ->
      """WITH cs AS (SELECT lang, source, count(*) AS c FROM documents GROUP BY 1, 2)
        |SELECT d.doc_id,
        |  CASE WHEN cs.c < 5 THEN NULL ELSE d.lang END AS lang,
        |  CASE WHEN cs.c < 5 THEN NULL ELSE d.source END AS source,
        |  cs.c < 5 AS suppressed
        |FROM documents d JOIN cs
        |  ON d.lang IS NOT DISTINCT FROM cs.lang
        | AND d.source IS NOT DISTINCT FROM cs.source""".stripMargin,

    "profile_columns" -> Seq(
      "o_orderkey", "o_custkey", "o_orderstatus", "o_orderpriority", "o_totalprice")
      .map(c =>
        s"""SELECT '$c' AS column_name, count(*) AS n_rows,
           |  count(*) - count($c) AS n_null,
           |  count(DISTINCT $c)::BIGINT AS n_distinct,
           |  min($c)::VARCHAR AS min_value, max($c)::VARCHAR AS max_value
           |FROM orders""".stripMargin)
      .mkString("\nUNION ALL\n"),

    "quality_expectations" -> {
      val checks = Seq(
        ("text_present", "length(text) > 0", 1000000L),
        ("n_chars_consistent", "n_chars = length(text)", 1000000L),
        ("lang_known", "lang IN ('en', 'de', 'fr', 'es', 'zh')", 1000000L),
        ("source_format", "regexp_matches(source, '^src[0-9]+$')", 1000000L),
        ("min_length_200", "length(text) >= 200", 900000L))
      checks.map { case (n, p, thr) =>
        val viol = s"coalesce(sum(CASE WHEN coalesce(($p), false) THEN 0 ELSE 1 END), 0)::BIGINT"
        s"""SELECT "check", n_rows, n_violations, pass_micro,
           |  pass_micro >= $thr AS passed FROM (
           |  SELECT '$n' AS "check", count(*) AS n_rows, $viol AS n_violations,
           |    CASE WHEN count(*) = 0 THEN 1000000::BIGINT
           |         ELSE floor((count(*) - $viol)::DOUBLE
           |                    / count(*)::DOUBLE * 1000000.0)::BIGINT
           |    END AS pass_micro
           |  FROM documents)""".stripMargin
      }.mkString("\nUNION ALL\n")
    },

    "freq_heavy_hitters" ->
      """SELECT event_type AS item, count(*)::BIGINT AS cnt
        |FROM events GROUP BY event_type""".stripMargin,

    // inclusive-rank quantile = smallest v with cume_dist ≥ r — the exact
    // definition KLL's INCLUSIVE search uses, so the exact-regime sketch
    // must reproduce it value-for-value
    "sketch_quantiles" ->
      """WITH cd AS (
        |  SELECT source, CAST(n_chars AS DOUBLE) AS v,
        |         cume_dist() OVER (PARTITION BY source ORDER BY n_chars) AS cd
        |  FROM documents WHERE n_chars IS NOT NULL)
        |SELECT source,
        |  min(v) FILTER (WHERE cd >= 0.5) AS q_50,
        |  min(v) FILTER (WHERE cd >= 0.9) AS q_90,
        |  min(v) FILTER (WHERE cd >= 0.99) AS q_99,
        |  count(*)::BIGINT AS n_rows
        |FROM cd GROUP BY source""".stripMargin,

    "sketch_quantiles_rollup" ->
      """WITH cd AS (
        |  SELECT CAST(n_chars AS DOUBLE) AS v,
        |         cume_dist() OVER (ORDER BY n_chars) AS cd
        |  FROM documents WHERE n_chars IS NOT NULL)
        |SELECT
        |  min(v) FILTER (WHERE cd >= 0.25) AS q_25,
        |  min(v) FILTER (WHERE cd >= 0.5) AS q_50,
        |  min(v) FILTER (WHERE cd >= 0.75) AS q_75,
        |  min(v) FILTER (WHERE cd >= 0.95) AS q_95,
        |  count(*)::BIGINT AS n_rows
        |FROM cd""".stripMargin,

    "sketch_quantile_trim" ->
      """WITH cd AS (
        |  SELECT source, n_chars,
        |         cume_dist() OVER (PARTITION BY source ORDER BY n_chars) AS cd
        |  FROM documents WHERE n_chars IS NOT NULL),
        |th AS (
        |  SELECT source,
        |    min(n_chars) FILTER (WHERE cd >= 0.05) AS lo,
        |    min(n_chars) FILTER (WHERE cd >= 0.95) AS hi
        |  FROM cd GROUP BY source)
        |SELECT d.source, count(*)::BIGINT AS kept,
        |  min(d.n_chars)::BIGINT AS min_kept, max(d.n_chars)::BIGINT AS max_kept
        |FROM documents d JOIN th USING (source)
        |WHERE d.n_chars BETWEEN th.lo AND th.hi
        |GROUP BY d.source""".stripMargin,

    "sketch_theta_contam" ->
      """WITH fp AS (
        |  SELECT doc_id, md5(regexp_replace(lower(text), '\s+', ' ', 'g')) AS fp
        |  FROM documents),
        |a AS (SELECT DISTINCT fp FROM fp WHERE doc_id % 50 <> 0 AND fp IS NOT NULL),
        |b AS (SELECT DISTINCT fp FROM fp WHERE doc_id % 50 = 0 AND fp IS NOT NULL)
        |SELECT
        |  (SELECT count(*) FROM a)::DOUBLE AS n_a,
        |  (SELECT count(*) FROM b)::DOUBLE AS n_b,
        |  (SELECT count(*) FROM (SELECT fp FROM a INTERSECT SELECT fp FROM b))::DOUBLE AS n_common,
        |  (SELECT count(*) FROM (SELECT fp FROM a UNION SELECT fp FROM b))::DOUBLE AS n_union,
        |  (SELECT count(*) FROM (SELECT fp FROM a EXCEPT SELECT fp FROM b))::DOUBLE AS n_only_a,
        |  (SELECT count(*) FROM (SELECT fp FROM b EXCEPT SELECT fp FROM a))::DOUBLE AS n_only_b""".stripMargin,

    "sketch_theta_core_vocab" ->
      s"""WITH t AS (
         |  SELECT DISTINCT source, tok FROM (
         |    SELECT source, unnest($toks) AS tok FROM documents)),
         |ns AS (SELECT count(DISTINCT source) AS n FROM documents)
         |SELECT
         |  (SELECT count(*) FROM (
         |     SELECT tok FROM t GROUP BY tok
         |     HAVING count(*) = (SELECT n FROM ns)))::DOUBLE AS core_vocab,
         |  (SELECT count(DISTINCT tok) FROM t)::DOUBLE AS total_vocab,
         |  (SELECT n FROM ns)::BIGINT AS n_sources""".stripMargin,

    "u1_scalar_udf" ->
      """SELECT event_id,
        |  CASE WHEN event_type IS NULL OR event_type = '' THEN event_type
        |       ELSE upper(substr(event_type, 1, 1)) || substr(event_type, 2) END AS evt
        |FROM events""".stripMargin,

    "u2_udaf_sumsq" ->
      """SELECT l_returnflag, sum(l_quantity * l_quantity) AS sq, count(*) AS cnt
        |FROM lineitem GROUP BY l_returnflag""".stripMargin,

    "u3_udtf_posexplode" ->
      s"""WITH t AS (SELECT doc_id, $toks AS toks FROM documents)
         |SELECT doc_id, u.pos AS pos, u.tok AS token
         |FROM (SELECT doc_id,
         |        unnest(list_transform(range(len(toks)), i -> {'pos': i, 'tok': toks[i+1]})) AS u
         |      FROM t)""".stripMargin,

    "p2_flatmap_values" ->
      s"""WITH t AS (SELECT doc_id, $toks AS toks FROM documents)
         |SELECT doc_id, unnest(toks) AS word FROM t""".stripMargin,

    "p4_select_key" ->
      """SELECT event_type AS ROWKEY, event_id, "value" FROM events""",

    "j3_window_outer_join" ->
      s"""SELECT coalesce(c.user_id, p.user_id) AS user_id,
         |       c.event_id AS click_id, p.event_id AS purchase_id
         |FROM (SELECT * FROM events WHERE event_type = 'click') c
         |FULL JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
         |  ON c.user_id = p.user_id
         | AND epoch_us(p.ts) BETWEEN epoch_us(c.ts) - $windowUs AND epoch_us(c.ts) + $windowUs""".stripMargin,

    "mm_binary_meta" ->
      """SELECT doc_id, octet_length(text::BLOB) AS n_bytes, sha256(text) AS sha
        |FROM documents""".stripMargin,

    // closed form of the synthesized headers mm_header_meta parses back
    "mm_header_meta" ->
      """SELECT doc_id,
        |  CASE doc_id % 3 WHEN 0 THEN 'bmp' WHEN 1 THEN 'png' ELSE 'wav' END AS fmt,
        |  (CASE WHEN doc_id % 3 IN (0, 1) THEN doc_id % 1024 + 1 END)::BIGINT AS width,
        |  (CASE WHEN doc_id % 3 IN (0, 1) THEN doc_id % 768 + 1 END)::BIGINT AS height,
        |  (CASE WHEN doc_id % 3 = 2 THEN 8000 + (doc_id % 5) * 8000 END)::BIGINT AS sample_rate,
        |  (CASE WHEN doc_id % 3 = 2 THEN 2 END)::BIGINT AS channels,
        |  (CASE WHEN doc_id % 3 = 2 THEN 0 END)::BIGINT AS duration_ms
        |FROM documents""".stripMargin,

    // closed form of the synthesized per-doc WAV: byteRate = 2·sr
    // (mono 16-bit), winBytes = align₂(byteRate·2ms), ASCII data so
    // substring-by-character equals the engine's byte slicing
    "mm_audio_windows" ->
      """WITH base AS (
        |  SELECT doc_id,
        |    repeat(md5(text), (doc_id % 7 + 4)::INT) AS data,
        |    length(repeat(md5(text), (doc_id % 7 + 4)::INT))::BIGINT AS dl,
        |    (2 * (8000 + (doc_id % 5) * 8000))::BIGINT AS br
        |  FROM documents),
        |w AS (SELECT *, greatest(2, ((br * 2 // 1000) // 2) * 2)::BIGINT AS wb FROM base),
        |nw AS (SELECT *, ceil(dl::DOUBLE / wb::DOUBLE)::BIGINT AS n FROM w WHERE dl > 0),
        |g AS (SELECT doc_id, data, dl, br, wb,
        |        unnest(generate_series(0, n - 1))::BIGINT AS window_idx
        |      FROM nw)
        |SELECT doc_id, window_idx,
        |  (window_idx * wb * 1000 // br)::BIGINT AS start_ms,
        |  least(wb, dl - window_idx * wb)::BIGINT AS n_bytes,
        |  sha256(substring(data, (1 + window_idx * wb)::INT,
        |    least(wb, dl - window_idx * wb)::INT)) AS sha
        |FROM g""".stripMargin,

    // closed form of the synthesized BMPs: rowSize = ⌈3w/4⌉·4, bands of
    // 3 storage rows; ASCII pixel bytes so substring == byte slicing
    "mm_image_bands" ->
      """WITH base AS (
        |  SELECT doc_id, text,
        |    (doc_id % 5 + 1)::BIGINT AS w, (doc_id % 9 + 2)::BIGINT AS h
        |  FROM documents),
        |d2 AS (SELECT doc_id, w, h, ((w * 3 + 3) // 4 * 4)::BIGINT AS rs,
        |         substring(repeat(md5(text), 6), 1,
        |           ((w * 3 + 3) // 4 * 4 * h)::INT) AS data
        |       FROM base),
        |nb AS (SELECT *, ceil(h::DOUBLE / 3.0)::BIGINT AS n FROM d2),
        |g AS (SELECT doc_id, data, rs, h,
        |        unnest(generate_series(0, n - 1))::BIGINT AS band_idx
        |      FROM nb)
        |SELECT doc_id, band_idx,
        |  (band_idx * 3)::BIGINT AS row0,
        |  least(3, h - band_idx * 3)::BIGINT AS n_rows,
        |  sha256(substring(data, (1 + band_idx * 3 * rs)::INT,
        |    (least(3, h - band_idx * 3) * rs)::INT)) AS sha
        |FROM g""".stripMargin,

    // the oracle recomputes the 63-bit hash from the generative closed
    // form (ascii() over the regenerated pixel STRING — never a binary),
    // so any off-by-one in offset/stride/endianness on the Spark side
    // breaks the hash match
    "mm_image_dhash" -> s"WITH $dhashCte\nSELECT doc_id, dhash FROM hsh",

    // every byte of the 8×6 output replayed from the source string:
    // output pixel (i, j) ← source byte pos 48·(2j) + 3·(2i) (+1, 1-based)
    "mm_image_resize" -> {
      val pix = (for (j <- 0 until 6; i <- 0 until 8)
        yield s"substr(s, ${48 * 2 * j + 6 * i + 1}, 3)").mkString(" || ")
      s"""WITH $dhashCte
         |SELECT doc_id, 8::BIGINT AS w, 6::BIGINT AS h, 198::BIGINT AS plen,
         |  $pix AS pix
         |FROM px""".stripMargin
    },

    // banded self-join + bit_count(xor) Hamming verify, replayed over the
    // same 4×16-bit bands the engine shuffles on
    "mm_image_neardup_pairs" ->
      s"""WITH $dhashCte,
         |$dhashBandedCte,
         |pr AS (
         |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
         |         bit_count(xor(a.dhash, b.dhash))::BIGINT AS hamming
         |  FROM banded a JOIN banded b
         |    ON a.band = b.band AND a.bval = b.bval AND a.doc_id < b.doc_id)
         |SELECT doc_a, doc_b, hamming FROM pr WHERE hamming <= 6""".stripMargin,

    // the cap=1 twin fires the hot-band stride on every bucket of size>1:
    // keep iff bucket under cap OR the portable h32(id·'_imgthin') lands
    // on the ceil(size/cap) stride — the same term-for-term replay the
    // cross-emb '_annthin' twin pins (SimilarityQueries)
    "mm_image_neardup_thinned" ->
      s"""WITH $dhashCte,
         |$dhashBandedCte,
         |bs AS (SELECT band, bval, count(*)::BIGINT AS bsize
         |       FROM banded GROUP BY band, bval),
         |bk AS (SELECT banded.* FROM banded JOIN bs USING (band, bval)
         |       WHERE bs.bsize <= 1
         |          OR ('0x' || substr(md5(banded.doc_id::VARCHAR || '_imgthin'), 1, 8))::BIGINT
         |             % ceil(bs.bsize::DOUBLE / 1)::BIGINT = 0),
         |pr AS (
         |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
         |         bit_count(xor(a.dhash, b.dhash))::BIGINT AS hamming
         |  FROM bk a JOIN bk b
         |    ON a.band = b.band AND a.bval = b.bval AND a.doc_id < b.doc_id)
         |SELECT doc_a, doc_b, hamming FROM pr WHERE hamming <= 6""".stripMargin,

    // keeper rule: a doc is dropped iff a LOWER-id doc is its near-dup
    "mm_image_neardup_kept" ->
      s"""WITH $dhashCte,
         |$dhashBandedCte,
         |drp AS (
         |  SELECT DISTINCT b.doc_id AS doc_b
         |  FROM banded a JOIN banded b
         |    ON a.band = b.band AND a.bval = b.bval AND a.doc_id < b.doc_id
         |  WHERE bit_count(xor(a.dhash, b.dhash)) <= 6)
         |SELECT doc_id FROM documents
         |WHERE doc_id NOT IN (SELECT doc_b FROM drp)""".stripMargin,

    // closed form of the synthesized avih fields headerMeta parses back
    "mm_video_meta" ->
      """SELECT doc_id, 'avi' AS fmt,
        |  (doc_id % 640 + 1)::BIGINT AS width,
        |  (doc_id % 480 + 1)::BIGINT AS height,
        |  ((doc_id % 100) * 33333 // 1000)::BIGINT AS duration_ms
        |FROM documents""".stripMargin,

    // closed form of the synthesized AVIs: fb = ⌈3w/4⌉·4·h DIB bytes per
    // frame, 3 frames, t_ms = ⌊k·µsPerFrame/1000⌋; ASCII frame bytes so
    // substring == byte slicing
    "mm_video_frames" ->
      """WITH v AS (
        |  SELECT doc_id, text,
        |    (doc_id % 4 + 1)::BIGINT AS w, (doc_id % 3 + 2)::BIGINT AS h,
        |    (33000 + (doc_id % 5) * 1000)::BIGINT AS us
        |  FROM documents),
        |d2 AS (SELECT doc_id, us, ((w * 3 + 3) // 4 * 4 * h)::BIGINT AS fb, text FROM v),
        |g AS (SELECT doc_id, us, fb, text,
        |        unnest([0, 1, 2])::BIGINT AS frame_idx FROM d2)
        |SELECT doc_id, frame_idx,
        |  (frame_idx * us // 1000)::BIGINT AS t_ms, fb AS n_bytes,
        |  sha256(substr(repeat(md5(text || frame_idx::VARCHAR), 2), 1, fb::INT)) AS sha
        |FROM g""".stripMargin,

    "mm_video_keyframe_dhash" -> s"WITH $videoKeyCte\nSELECT doc_id, dhash FROM vkh",

    "mm_video_neardup_kept" ->
      s"""WITH $videoKeyCte,
         |vbanded AS (
         |  SELECT doc_id, dhash, band, (dhash >> (16 * band)) & 65535 AS bval
         |  FROM vkh, (SELECT unnest([0, 1, 2, 3]) AS band) bands),
         |vdrp AS (
         |  SELECT DISTINCT b.doc_id AS doc_b
         |  FROM vbanded a JOIN vbanded b
         |    ON a.band = b.band AND a.bval = b.bval AND a.doc_id < b.doc_id
         |  WHERE bit_count(xor(a.dhash, b.dhash)) <= 6)
         |SELECT doc_id FROM documents
         |WHERE doc_id NOT IN (SELECT doc_b FROM vdrp)""".stripMargin,

    "mm_audio_fp" -> s"WITH $afpCte\nSELECT doc_id, afp FROM afh",

    "mm_audio_neardup_pairs" ->
      s"""WITH $afpCte,
         |$afpBandedCte,
         |apr AS (
         |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
         |         bit_count(xor(a.afp, b.afp))::BIGINT AS hamming
         |  FROM abanded a JOIN abanded b
         |    ON a.band = b.band AND a.bval = b.bval AND a.doc_id < b.doc_id)
         |SELECT doc_a, doc_b, hamming FROM apr WHERE hamming <= 10""".stripMargin,

    "mm_audio_neardup_kept" ->
      s"""WITH $afpCte,
         |$afpBandedCte,
         |adrp AS (
         |  SELECT DISTINCT b.doc_id AS doc_b
         |  FROM abanded a JOIN abanded b
         |    ON a.band = b.band AND a.bval = b.bval AND a.doc_id < b.doc_id
         |  WHERE bit_count(xor(a.afp, b.afp)) <= 10)
         |SELECT doc_id FROM documents
         |WHERE doc_id NOT IN (SELECT doc_b FROM adrp)""".stripMargin,

    // identity: the round-trip must reproduce the source exactly
    "p11_format_roundtrip" -> "SELECT doc_id, text FROM documents",

    // the REKEYED join's oracle is the PLAIN-key join — that equality is J4
    "j4_rekeyed_join" ->
      s"""SELECT c.user_id, c.event_id AS click_id, p.event_id AS purchase_id,
         |       epoch_us(p.ts) - epoch_us(c.ts) AS lag_us
         |FROM events c JOIN events p
         |  ON c.user_id = p.user_id
         | AND epoch_us(p.ts) BETWEEN epoch_us(c.ts) - $windowUs AND epoch_us(c.ts) + $windowUs
         |WHERE c.event_type = 'click' AND p.event_type = 'purchase'""".stripMargin,

    "s5_json_envelope_roundtrip" -> "SELECT doc_id, lang FROM documents",

    "s9_delimited_roundtrip" ->
      "SELECT event_id, user_id, event_type FROM events",

    "s10_union_routing" ->
      """SELECT event_id, user_id, "value" AS click_val, NULL::DOUBLE AS purch_val
        |FROM events WHERE event_type = 'click'
        |UNION ALL
        |SELECT event_id, user_id, NULL::DOUBLE AS click_val, "value" AS purch_val
        |FROM events WHERE event_type = 'purchase'""".stripMargin,

    "s11_smt_chain" ->
      """SELECT event_id, event_type,
        |  ('0x' || substr(md5(user_id::VARCHAR), 1, 8))::BIGINT AS user_mask,
        |  (floor("value" / 50) * 50)::BIGINT AS value_bucket
        |FROM events WHERE event_type <> 'view'""".stripMargin,

    "skew_salted_agg" ->
      """SELECT event_type, count(*) AS cnt,
        |  sum("value"::DECIMAL(18,2))::DOUBLE AS v
        |FROM events GROUP BY event_type""".stripMargin,

    // the PARTIAL-then-merge count's oracle is the single-pass count — A4
    "a4_incremental_equiv" ->
      s"""SELECT w AS word, count(*) AS cnt
         |FROM (SELECT unnest($toks) AS w FROM documents)
         |GROUP BY w""".stripMargin,

    // the lakehouse write strategies are access paths, not semantics:
    // the COW oracle is the merge applied in plain SQL
    "lake_cow_upsert" ->
      """SELECT o_orderpriority, count(*) AS n,
        |  sum(o_totalprice::DECIMAL(18,2))::DOUBLE AS total
        |FROM (
        |  SELECT o_orderpriority,
        |         CASE WHEN o_orderkey % 97 = 0 THEN o_totalprice + 1000
        |              ELSE o_totalprice END AS o_totalprice
        |  FROM orders WHERE o_orderkey % 113 <> 0
        |  UNION ALL
        |  SELECT 'X-NEW' AS o_orderpriority, o_totalprice
        |  FROM orders WHERE o_orderkey % 131 = 0
        |) GROUP BY o_orderpriority""".stripMargin,

    // v2 (%194) beats both the v1 bump and the v1 tombstone; the v1
    // tombstone beats the same-version v1 bump; else base
    "lake_mor_view" ->
      """SELECT o_orderpriority, count(*) AS n,
        |  sum(o_totalprice::DECIMAL(18,2))::DOUBLE AS total
        |FROM (
        |  SELECT o_orderpriority,
        |         CASE WHEN o_orderkey % 194 = 0 THEN o_totalprice + 1500
        |              WHEN o_orderkey % 97 = 0 THEN o_totalprice + 1000
        |              ELSE o_totalprice END AS o_totalprice
        |  FROM orders
        |  WHERE o_orderkey % 194 = 0 OR o_orderkey % 113 <> 0
        |) GROUP BY o_orderpriority""".stripMargin,

    // v1 only: the %97 bump and the %113 tombstone, no %194 re-bump
    "lake_time_travel" ->
      """SELECT o_orderpriority, count(*) AS n,
        |  sum(o_totalprice::DECIMAL(18,2))::DOUBLE AS total
        |FROM (
        |  SELECT o_orderpriority,
        |         CASE WHEN o_orderkey % 97 = 0 THEN o_totalprice + 1000
        |              ELSE o_totalprice END AS o_totalprice
        |  FROM orders WHERE o_orderkey % 113 <> 0
        |) GROUP BY o_orderpriority""".stripMargin,

    // IVM refresh answers the SAME truth as the COW full re-aggregation
    "lake_incr_stats" ->
      """SELECT o_orderpriority, count(*) AS n,
        |  sum(o_totalprice::DECIMAL(18,2))::DOUBLE AS total
        |FROM (
        |  SELECT o_orderpriority,
        |         CASE WHEN o_orderkey % 97 = 0 THEN o_totalprice + 1000
        |              ELSE o_totalprice END AS o_totalprice
        |  FROM orders WHERE o_orderkey % 113 <> 0
        |  UNION ALL
        |  SELECT 'X-NEW' AS o_orderpriority, o_totalprice
        |  FROM orders WHERE o_orderkey % 131 = 0
        |) GROUP BY o_orderpriority""".stripMargin,

    // the upsert's effect per key, straight from the batch rules
    "lake_change_feed" ->
      """SELECT o_orderkey, 'removed' AS change FROM orders WHERE o_orderkey % 113 = 0
        |UNION ALL
        |SELECT o_orderkey + 100000000 AS o_orderkey, 'added' AS change
        |FROM orders WHERE o_orderkey % 131 = 0
        |UNION ALL
        |SELECT o_orderkey,
        |  CASE WHEN o_orderkey % 97 = 0 THEN 'changed' ELSE 'unchanged' END AS change
        |FROM orders WHERE o_orderkey % 113 <> 0""".stripMargin,

    // final corpus state = retained corpus ∪ (batch rows that survive the
    // quality gate, within-batch first-per-fingerprint, and the
    // corpus-index anti join) — run-count-invariant, so plain SQL
    "lake_incr_curate" ->
      s"""WITH t AS (SELECT doc_id, source, md5(text) AS fp,
         |                  len($toks)::BIGINT AS n_tokens FROM documents),
         |corpus AS (SELECT * FROM t WHERE doc_id % 10 <> 0),
         |batch AS (SELECT * FROM t WHERE doc_id % 10 = 0 AND n_tokens >= 10),
         |bk AS (SELECT fp, min(doc_id) AS doc_id FROM batch GROUP BY fp),
         |kept AS (SELECT b.* FROM batch b JOIN bk USING (fp, doc_id)
         |         WHERE NOT EXISTS (SELECT 1 FROM corpus c WHERE c.fp = b.fp)),
         |final AS (SELECT source, n_tokens FROM corpus
         |          UNION ALL SELECT source, n_tokens FROM kept)
         |SELECT source, count(*) AS n_docs, sum(n_tokens)::BIGINT AS total_tokens
         |FROM final GROUP BY source""".stripMargin,

    "lake_compact_equiv" ->
      """SELECT o_orderpriority, count(*) AS n,
        |  sum(o_totalprice::DECIMAL(18,2))::DOUBLE AS total
        |FROM (
        |  SELECT o_orderpriority,
        |         CASE WHEN o_orderkey % 194 = 0 THEN o_totalprice + 1500
        |              WHEN o_orderkey % 97 = 0 THEN o_totalprice + 1000
        |              ELSE o_totalprice END AS o_totalprice
        |  FROM orders
        |  WHERE o_orderkey % 194 = 0 OR o_orderkey % 113 <> 0
        |) GROUP BY o_orderpriority""".stripMargin)
}
