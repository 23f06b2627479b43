package graft

import java.nio.file.Files
import org.apache.spark.sql.types.StructType
import graft.streaming.StreamingLsh

/** Streaming LSH state durability: the bucket representatives survive a
  * query restart — a doc arriving AFTER recovery is still flagged against
  * a representative seen BEFORE the stop. File source + foreachBatch sink
  * (memory sink does not support checkpoint recovery).
  */
class StreamingLshRecoverySpec extends SparkSpec {

  test("bucket state survives a stop/restart from checkpoint") {
    val dir = Files.createTempDirectory("graft_lsh_ckpt_").toFile
    val inDir = new java.io.File(dir, "in"); inDir.mkdirs()
    val ckpt = new java.io.File(dir, "ckpt").getPath
    val schema = StructType.fromDDL("doc_id BIGINT, text STRING")
    val base = "the quick brown fox jumps over the lazy dog again and again today"

    def writeDocs(name: String, docs: Seq[(Long, String)]): Unit =
      Files.write(new java.io.File(inDir, name).toPath,
        docs.map { case (i, t) => s"""{"doc_id": $i, "text": "$t"}""" }
          .mkString("", "\n", "\n").getBytes("UTF-8"))

    val rows = scala.collection.concurrent.TrieMap[(Long, Int), Long]()
    def startQuery() =
      StreamingLsh.bucketFirstSeen(
        spark.readStream.schema(schema).option("maxFilesPerTrigger", "10")
          .json(inDir.getPath), "text", "doc_id")
        .writeStream
        .foreachBatch { (ds: org.apache.spark.sql.Dataset[(Long, Int, Long)], _: Long) =>
          ds.collect().foreach { case (d, b, rep) => rows.update((d, b), rep) }
          ()
        }
        .option("checkpointLocation", ckpt).outputMode("append").start()

    // phase 1: the future representative plus an unrelated doc
    writeDocs("p1.json", Seq(100L -> base,
      900L -> "totally different content about distributed query engines"))
    val q1 = startQuery()
    try q1.processAllAvailable() finally q1.stop()
    assert(rows.keys.map(_._1).toSet === Set(100L, 900L))

    // phase 2: fresh query from the same checkpoint; a near-identical doc
    // must be flagged against the PRE-RESTART representative
    writeDocs("p2.json", Seq(200L -> base))
    val q2 = startQuery()
    try q2.processAllAvailable() finally q2.stop()
    val hits200 = rows.collect { case ((200L, b), rep) => (b, rep) }.toSeq
    assert(hits200.nonEmpty)
    assert(hits200.exists(_._2 == 100L),
      s"post-restart doc must see the pre-restart rep, got $hits200")
  }
}
