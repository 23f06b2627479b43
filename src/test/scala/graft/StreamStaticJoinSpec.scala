package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Stream-static enrichment join (the KTable/GlobalKTable-style lookup the
  * reference links but never exercises — free in Spark, declared as engine
  * surface): a streaming fact joins a static dimension; the dim is
  * broadcast, no streaming state needed.
  */
class StreamStaticJoinSpec extends SparkSpec {
  import spark.implicits._

  case class Click(userKey: Long, page: String, ts: Timestamp)

  test("streaming facts enrich against a static dimension") {
    implicit val ctx = spark.sqlContext
    val dim = Seq((1L, "alice", "emea"), (2L, "bob", "apac")).toDF("userKey", "name", "region")
    val in = MemoryStream[Click]
    val joined = in.toDF()
      .join(broadcast(dim), Seq("userKey"), "left")
      .select($"page", coalesce($"name", lit("unknown")).as("who"), $"region")
    val q = joined.writeStream.format("memory").queryName("enrich")
      .outputMode("append").start()
    try {
      val t = new Timestamp(1700000000000L)
      in.addData(Click(1L, "/home", t), Click(2L, "/docs", t), Click(9L, "/404", t))
      q.processAllAvailable()
      val rows = spark.table("enrich").as[(String, String, String)].collect().toSet
      assert(rows === Set(
        ("/home", "alice", "emea"),
        ("/docs", "bob", "apac"),
        ("/404", "unknown", null)))
    } finally q.stop()
  }

  test("streaming facts enrich against SCD2 history: the right VERSION wins") {
    // temporal lookup: the static side is Cdc.scd2 output (validity
    // intervals), the join keys on entity + event-time ∈ [from, to) — so a
    // late event picks the version that was live AT ITS TIME, not the
    // current one. Dim broadcast, residual evaluated per row, no state.
    implicit val ctx = spark.sqlContext
    val changes = Seq(
      (1L, 100L, 1L, "v_old"), (1L, 200L, 2L, "v_new"),
      (2L, 150L, 3L, "only")).toDF("k", "ts", "off", "value")
    val hist = graft.ops.Cdc.scd2(changes, "k", "ts", "off")
    val in = MemoryStream[(Long, Long, String)]
    val joined = in.toDF().toDF("ek", "ets", "what")
      .join(broadcast(hist),
        col("ek") === col("k") && col("ets") >= col("valid_from") &&
          (col("valid_to").isNull || col("ets") < col("valid_to")), "left")
      .select(col("ets"), col("what"), col("value"))
    val q = joined.writeStream.format("memory").queryName("scd2_enrich")
      .outputMode("append").start()
    try {
      in.addData((1L, 150L, "late"), (1L, 250L, "fresh"), (2L, 140L, "early"))
      q.processAllAvailable()
      val rows = spark.table("scd2_enrich").as[(Long, String, String)].collect().toSet
      assert(rows === Set(
        (150L, "late", "v_old"),   // event-time 150 sees the pre-200 version
        (250L, "fresh", "v_new"),
        (140L, "early", null)))    // before the entity existed
    } finally q.stop()
  }
}
