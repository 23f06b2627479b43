package graft

import java.nio.file.Files
import org.apache.spark.sql.types.StructType
import graft.streaming.CustomState

/** Streaming golden-record durability: the per-attribute (priority, value)
  * state survives a query restart — an attribute learned BEFORE the stop
  * still wins/loses against updates arriving AFTER recovery. File source +
  * foreachBatch sink (memory sink does not support checkpoint recovery).
  */
class GoldenRecoverySpec extends SparkSpec {
  import spark.implicits._

  test("attribute state survives a stop/restart from checkpoint") {
    val dir = Files.createTempDirectory("graft_golden_ckpt_").toFile
    val inDir = new java.io.File(dir, "in"); inDir.mkdirs()
    val ckpt = new java.io.File(dir, "ckpt").getPath
    val schema = StructType.fromDDL("key STRING, pri BIGINT, attr STRING, value STRING")

    def writeRows(name: String, rows: Seq[(String, Long, String, String)]): Unit =
      Files.write(new java.io.File(inDir, name).toPath,
        rows.map { case (k, p, a, v) =>
          s"""{"key": "$k", "pri": $p, "attr": "$a", "value": "$v"}""" }
          .mkString("", "\n", "\n").getBytes("UTF-8"))

    val merged = scala.collection.concurrent.TrieMap[String, Map[String, String]]()
    def startQuery() = {
      val in = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "10").json(inDir.getPath)
        .selectExpr("key", "pri", "map(attr, value) AS attrs")
        .as[(String, Long, Map[String, String])]
      CustomState.goldenRecordState(in)
        .writeStream
        .foreachBatch { (ds: org.apache.spark.sql.Dataset[(String, Map[String, String])], _: Long) =>
          ds.collect().foreach { case (k, m) => merged.update(k, m) }
          ()
        }
        .option("checkpointLocation", ckpt).outputMode("update").start()
    }

    // phase 1: brand set at priority 5
    writeRows("p1.json", Seq(("e1", 5L, "brand", "b5"), ("e1", 5L, "size", "s5")))
    val q1 = startQuery()
    try q1.processAllAvailable() finally q1.stop()
    assert(merged("e1") === Map("brand" -> "b5", "size" -> "s5"))

    // phase 2 after restart: a LATE priority-3 brand must lose to the
    // checkpointed priority-5 value; a new priority-7 size must win
    writeRows("p2.json", Seq(("e1", 3L, "brand", "b3"), ("e1", 7L, "size", "s7")))
    val q2 = startQuery()
    try q2.processAllAvailable() finally q2.stop()
    assert(merged("e1") === Map("brand" -> "b5", "size" -> "s7"),
      s"recovered state must arbitrate priorities, got ${merged("e1")}")
  }
}
