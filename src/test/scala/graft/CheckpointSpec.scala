package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType
import graft.ops.Text

/** Checkpoint / state recovery (SURVEY §2.8 T2, ≙ reference source-offset
  * tracking `ConnectSourceConsumer.java:292-295` + state-store changelogs):
  * a word-count query is stopped mid-corpus and restarted from its
  * checkpoint; the restarted query must resume from the recorded offsets
  * with its aggregation state intact, yielding the full-corpus counts.
  */
class CheckpointSpec extends SparkSpec {
  import spark.implicits._

  test("T2: word count resumes from checkpoint with state intact") {
    val dir = Files.createTempDirectory("graft_ckpt_").toFile
    val inDir = new java.io.File(dir, "in"); inDir.mkdirs()
    val ckpt = new java.io.File(dir, "ckpt").getPath
    val schema = StructType.fromDDL("text STRING")

    def writeLines(name: String, lines: Seq[String]): Unit =
      Files.write(new java.io.File(inDir, name).toPath,
        lines.mkString("", "\n", "\n").getBytes("UTF-8"))

    // foreachBatch sink (the same shape as the JDBC sink adapter) — the
    // memory sink does not support checkpoint recovery
    val collected = scala.collection.concurrent.TrieMap[Int, Map[String, Long]]()
    def startQuery(run: Int) =
      Text.wordCount(
        spark.readStream.schema(schema).option("maxFilesPerTrigger", "10")
          .text(inDir.getPath).toDF("text"), "text")
        .writeStream
        .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
          val m = df.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
          collected.updateWith(run)(prev => Some(prev.getOrElse(Map.empty) ++ m))
          ()
        }
        .option("checkpointLocation", ckpt).outputMode("update").start()

    // phase 1: first half of the reference corpus (FIXTURES.md F1)
    writeLines("part1.txt", Seq(
      "To be, or not to be,--that is the question:--",
      "Whether 'tis nobler in the mind to suffer"))
    val q1 = startQuery(1)
    try q1.processAllAvailable() finally q1.stop()
    val afterRun1 = collected(1)
    assert(afterRun1("to") === 3L && afterRun1("the") === 2L)

    // phase 2: restart from the same checkpoint; only new files processed,
    // but counts continue from recovered state
    writeLines("part2.txt", Seq(
      "The slings and arrows of outrageous fortune",
      "Or to take arms against a sea of troubles,"))
    val q2 = startQuery(2)
    try q2.processAllAvailable() finally q2.stop()
    val afterRun2 = collected(2)

    // golden finals (KafkaWordCountTest.java:152-160): state carried over
    assert(afterRun2("to") === 4L)
    assert(afterRun2("the") === 3L)
    assert(afterRun2("of") === 2L)
    assert(afterRun2("or") === 2L)
    // restart processed ONLY the new files: words exclusive to part1 are
    // absent from run2's update stream
    assert(!afterRun2.contains("question"))

    // production queryable-state path: read the aggregation's StateStore
    // straight from the checkpoint (distributed, no running query) — the
    // at-scale KS store.all() analogue
    val state = graft.api.QueryableState.fromCheckpoint(spark, ckpt)
      .selectExpr("key.word AS word", "value.`count` AS cnt")
      .as[(String, Long)].collect().toMap
    val golden = Map("to" -> 4L, "be" -> 2L, "or" -> 2L, "the" -> 3L, "not" -> 1L,
      "that" -> 1L, "is" -> 1L, "question" -> 1L, "whether" -> 1L)
    golden.foreach { case (w, c) => assert(state.get(w).contains(c), s"state[$w]") }
    // full final state, including part1-only words the update stream no
    // longer carries
    assert(state.contains("question"))
  }
}
