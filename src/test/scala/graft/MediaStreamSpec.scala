package graft

import java.nio.{ByteBuffer, ByteOrder}

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.ops.Multimodal
import graft.streaming.MediaStream

/** Streaming media near-dup: a later near-identical image is flagged
  * against the earlier one ACROSS micro-batches (bucket state persists),
  * same-batch duplicates resolve to the min id, unrelated payloads stay
  * clean, undecodable payloads pass through silently — and the streamed
  * candidate set agrees with the batch banded join exactly.
  */
class MediaStreamSpec extends SparkSpec {
  import spark.implicits._

  private def bmpWithData(width: Int, height: Int, data: Array[Byte]): Array[Byte] = {
    val b = ByteBuffer.allocate(54 + data.length).order(ByteOrder.LITTLE_ENDIAN)
    b.put('B'.toByte).put('M'.toByte).putInt(54 + data.length).putInt(0).putInt(54)
    b.putInt(40).putInt(width).putInt(height).putShort(1).putShort(24)
    b.position(54)
    b.put(data)
    b.array()
  }

  private val rnd = new scala.util.Random(23)
  private val rs = ((16 * 3 + 3) / 4) * 4
  private val baseImg = { val d = new Array[Byte](rs * 12); rnd.nextBytes(d); d }
  private val otherImg = { val d = new Array[Byte](rs * 12); rnd.nextBytes(d); d }

  private def mediaDf(df: org.apache.spark.sql.DataFrame) =
    df.select(col("doc_id"), Multimodal.asMedia(col("p"), "image/bmp").as("media"))

  test("image near-dups flagged across and within batches; batch ≡ streaming candidates") {
    implicit val ctx = spark.sqlContext
    val input = MemoryStream[(Long, Array[Byte])]
    val q = MediaStream.imageBucketFirstSeen(
        mediaDf(input.toDF().toDF("doc_id", "p")), "doc_id", "media")
      .toDF("doc_id", "band", "rep")
      .writeStream.format("memory").queryName("media_stream")
      .outputMode("append").start()
    val b1 = Seq(100L -> baseImg, 301L -> baseImg, 300L -> baseImg,
      7L -> Array[Byte](1, 2)) // undecodable: no bucket, no crash
    val b2 = Seq(200L -> baseImg, 999L -> otherImg)
    try {
      input.addData(b1.map { case (id, p) => (id, p) }: _*)
      q.processAllAvailable()
      input.addData(b2.map { case (id, p) => (id, p) }: _*)
      q.processAllAvailable()
      val r = spark.table("media_stream").as[(Long, Int, Long)].collect().toSeq
      // batch 1: 100 is its own rep; 300/301 resolve to the batch min 100
      assert(r.filter(_._1 == 100L).forall(_._3 == 100L))
      assert(r.filter(_._1 == 301L).forall(_._3 == 100L))
      // batch 2: the cross-batch duplicate sees the persisted bucket state
      assert(r.filter(_._1 == 200L).forall(_._3 == 100L))
      assert(r.filter(_._1 == 999L).forall(_._3 == 999L))
      assert(!r.exists(_._1 == 7L), "undecodable payloads produce no bucket rows")
      // batch ≡ streaming: streamed keepers equal the batch anti-join at
      // the no-verification threshold (band candidacy is the shared rule)
      val streamedDropped = r.filter(row => row._3 < row._1).map(_._1).toSet
      val batchKept = Multimodal.dropNearDupImages(
          mediaDf((b1 ++ b2).toDF("doc_id", "p")), "doc_id", "media",
          maxHamming = 63, maxBucket = Int.MaxValue)
        .select("doc_id").collect().map(_.getLong(0)).toSet
      assert(batchKept === ((b1 ++ b2).map(_._1).toSet -- streamedDropped))
    } finally q.stop()
  }

  test("media bucket state survives a stop/restart from checkpoint") {
    // file source + foreachBatch (memory sink does not support recovery);
    // payload bytes ride JSON as base64 → BINARY, the wire shape a real
    // media ingest uses
    val dir = java.nio.file.Files.createTempDirectory("graft_media_ckpt_").toFile
    val inDir = new java.io.File(dir, "in"); inDir.mkdirs()
    val ckpt = new java.io.File(dir, "ckpt").getPath
    val schema = org.apache.spark.sql.types.StructType.fromDDL("doc_id BIGINT, p BINARY")
    def writeDocs(name: String, docs: Seq[(Long, Array[Byte])]): Unit =
      java.nio.file.Files.write(new java.io.File(inDir, name).toPath,
        docs.map { case (i, p) =>
          s"""{"doc_id": $i, "p": "${java.util.Base64.getEncoder.encodeToString(p)}"}"""
        }.mkString("", "\n", "\n").getBytes("UTF-8"))

    val rows = scala.collection.concurrent.TrieMap[(Long, Int), Long]()
    def startQuery() =
      MediaStream.imageBucketFirstSeen(
        spark.readStream.schema(schema).option("maxFilesPerTrigger", "10")
          .json(inDir.getPath)
          .select(col("doc_id"), Multimodal.asMedia(col("p"), "image/bmp").as("media")),
        "doc_id", "media")
        .writeStream
        .foreachBatch { (ds: org.apache.spark.sql.Dataset[(Long, Int, Long)], _: Long) =>
          ds.collect().foreach { case (d, b, rep) => rows.update((d, b), rep) }
          ()
        }
        .option("checkpointLocation", ckpt).outputMode("append").start()

    // phase 1: the future representative plus an unrelated image
    writeDocs("p1.json", Seq(100L -> bmpWithData(16, 12, baseImg),
      900L -> bmpWithData(16, 12, otherImg)))
    val q1 = startQuery()
    try q1.processAllAvailable() finally q1.stop()
    assert(rows.keys.map(_._1).toSet === Set(100L, 900L))

    // phase 2: fresh query from the same checkpoint; the identical image
    // must be flagged against the PRE-RESTART representative
    writeDocs("p2.json", Seq(200L -> bmpWithData(16, 12, baseImg)))
    val q2 = startQuery()
    try q2.processAllAvailable() finally q2.stop()
    val hits200 = rows.collect { case ((200L, b), rep) => (b, rep) }.toSeq
    assert(hits200.nonEmpty)
    assert(hits200.forall(_._2 == 100L),
      s"post-restart image must see the pre-restart rep, got $hits200")
  }

  test("audio stream twin shares the contract") {
    implicit val ctx = spark.sqlContext
    def wavWithData(data: Array[Byte]): Array[Byte] = {
      val b = ByteBuffer.allocate(44 + data.length).order(ByteOrder.LITTLE_ENDIAN)
      b.put("RIFF".getBytes).putInt(36 + data.length).put("WAVE".getBytes)
      b.put("fmt ".getBytes).putInt(16).putShort(1).putShort(1)
      b.putInt(8000).putInt(16000).putShort(2).putShort(16)
      b.put("data".getBytes).putInt(data.length)
      b.put(data)
      b.array()
    }
    val pcm = { val d = new Array[Byte](256); rnd.nextBytes(d); d }
    val input = MemoryStream[(Long, Array[Byte])]
    val q = MediaStream.audioBucketFirstSeen(
        input.toDF().toDF("doc_id", "p")
          .select(col("doc_id"), Multimodal.asMedia(col("p"), "audio/wav").as("media")),
        "doc_id", "media")
      .toDF("doc_id", "band", "rep")
      .writeStream.format("memory").queryName("media_stream_audio")
      .outputMode("append").start()
    try {
      input.addData(10L -> wavWithData(pcm)); q.processAllAvailable()
      input.addData(20L -> wavWithData(pcm)); q.processAllAvailable()
      val r = spark.table("media_stream_audio").as[(Long, Int, Long)].collect().toSeq
      assert(r.filter(_._1 == 10L).forall(_._3 == 10L))
      assert(r.filter(_._1 == 20L).forall(_._3 == 10L), "exact dup must hit persisted state")
    } finally q.stop()
  }
}
