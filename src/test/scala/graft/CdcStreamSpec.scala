package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.streaming.CdcStream
import graft.streaming.CdcStream.{Scd2Change, Scd2Version}

/** Streaming SCD2: final-state equivalence against the batch
  * [[graft.ops.Cdc.scd2]], interval closure across micro-batches,
  * within-batch out-of-order handling, and the explicit late-drop rule.
  */
class CdcStreamSpec extends SparkSpec {
  import spark.implicits._

  /** Latest emission per (key, valid_from, tie) — the changelog's final
    * state, what a keyed upsert sink would retain.
    */
  private def finalState(rows: Seq[Scd2Version]): Set[(String, Long, Long, String, Option[Long], Boolean)] =
    rows.zipWithIndex
      .groupBy { case (v, _) => (v.key, v.valid_from, v.tie) }
      .map { case (_, vs) => val v = vs.maxBy(_._2)._1
        (v.key, v.valid_from, v.tie, v.value, v.valid_to, v.is_current) }
      .toSet

  private def batchScd2(changes: Seq[Scd2Change]): Set[(String, Long, Long, String, Option[Long], Boolean)] =
    graft.ops.Cdc.scd2(changes.toDF(), "key", "ts", "tie")
      .select(col("key"), col("valid_from").cast("long"), col("tie"),
        col("value"), col("valid_to").cast("long"), col("is_current"))
      .as[(String, Long, Long, String, Option[Long], Boolean)]
      .collect().toSet

  test("final state across micro-batches equals batch scd2; versions close exactly once") {
    implicit val ctx = spark.sqlContext
    val in = MemoryStream[Scd2Change]
    val q = CdcStream.scd2State(in.toDS())
      .writeStream.format("memory").queryName("scd2s").outputMode("update").start()
    try {
      // batch 1: two keys; k1 arrives OUT OF ORDER within the batch
      val b1 = Seq(Scd2Change("k1", 200L, 2L, "b"), Scd2Change("k1", 100L, 1L, "a"),
        Scd2Change("k2", 150L, 3L, "x"))
      in.addData(b1: _*); q.processAllAvailable()
      val afterB1 = spark.table("scd2s").as[Scd2Version].collect().toSeq
      assert(finalState(afterB1) === batchScd2(b1),
        "one micro-batch must already match the batch materialization")
      // batch 2: k1 advances (closes 200), k2 same-ts tie advance, k3 new
      val b2 = Seq(Scd2Change("k1", 300L, 4L, "c"), Scd2Change("k2", 150L, 5L, "y"),
        Scd2Change("k3", 400L, 6L, "z"))
      in.addData(b2: _*); q.processAllAvailable()
      val all = spark.table("scd2s").as[Scd2Version].collect().toSeq
      assert(finalState(all) === batchScd2(b1 ++ b2),
        "cross-batch final state must equal batch scd2 over the union")
      // the (k1, 200) version was emitted open in batch 1 and closed in
      // batch 2 — exactly two emissions, never a third
      assert(all.count(v => v.key == "k1" && v.valid_from == 200L) === 2)
      assert(all.find(v => v.key == "k1" && v.valid_from == 200L && !v.is_current)
        .flatMap(_.valid_to) === Some(300L))
    } finally q.stop()
  }

  test("late change (older than the open version) is dropped, state unharmed") {
    implicit val ctx = spark.sqlContext
    val in = MemoryStream[Scd2Change]
    val q = CdcStream.scd2State(in.toDS())
      .writeStream.format("memory").queryName("scd2late").outputMode("update").start()
    try {
      in.addData(Scd2Change("k1", 500L, 1L, "v5")); q.processAllAvailable()
      val n1 = spark.table("scd2late").count()
      // ts 400 < open 500 → dropped; equal (ts, tie) replay → dropped too
      in.addData(Scd2Change("k1", 400L, 2L, "stale"), Scd2Change("k1", 500L, 1L, "v5"))
      q.processAllAvailable()
      assert(spark.table("scd2late").count() === n1, "late rows must emit nothing")
      // a genuine advance still works after the late episode
      in.addData(Scd2Change("k1", 600L, 3L, "v6")); q.processAllAvailable()
      val fin = finalState(spark.table("scd2late").as[Scd2Version].collect().toSeq)
      assert(fin === Set(
        ("k1", 500L, 1L, "v5", Some(600L), false),
        ("k1", 600L, 3L, "v6", None, true)))
    } finally q.stop()
  }

  test("a changelog stream maintains a live (group, n, sum) aggregate") {
    // streaming IVM: each micro-batch of change IMAGES refreshes the
    // persisted stats via foreachBatch — base table never read. Batch 2
    // moves a key between groups and empties one group, so the final
    // stats prove cross-batch retraction against persisted state.
    implicit val ctx = spark.sqlContext
    val statsPath = java.nio.file.Files
      .createTempDirectory("graft_ivm_stream").toString + "/stats"
    // (key, change, old g, old v, new g, new v) → struct-image feed shape
    val in = MemoryStream[(Long, String, String, Long, String, Long)]
    def toImages(df: org.apache.spark.sql.DataFrame) = df
      .toDF("k", "change", "og", "ov", "ng", "nv")
      .select(col("k"), col("change"),
        when(col("change") =!= "added",
          struct(col("og").as("g"), col("ov").as("v"))).as("__old"),
        when(col("change") =!= "removed",
          struct(col("ng").as("g"), col("nv").as("v"))).as("__new"))
    val q = in.toDF().writeStream.outputMode("append")
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, bid: Long) =>
        // the batch id makes a post-publish-pre-commit crash replay a
        // no-op (Cdc records it inside the published table)
        graft.ops.Cdc.refreshGroupStatsAt(spark, statsPath,
          toImages(batch), "g", "v", batchId = Some(bid)); ()
      }.start()
    try {
      in.addData((1L, "added", null, 0L, "a", 10L),
        (2L, "added", null, 0L, "b", 20L),
        (3L, "added", null, 0L, "a", 5L))
      q.processAllAvailable()
      in.addData((2L, "changed", "b", 20L, "a", 21L), // moves b → a
        (3L, "removed", "a", 5L, null, 0L))
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.read.parquet(statsPath).orderBy("g")
      .as[(String, Long, Long)].collect().toSeq
    assert(got === Seq(("a", 2L, 31L)), s"group b must vanish: $got")
  }
}
