package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.streaming.CustomState

/** Custom-state streaming operators: watermark-bounded streaming dedup and
  * the flatMapGroupsWithState emit-on-change changelog.
  */
class CustomStateSpec extends SparkSpec {
  import spark.implicits._

  case class Rec(id: Long, payload: String, ts: Timestamp)
  private val base = 1700000000000L

  test("streaming exact dedup drops re-sends within the watermark window") {
    implicit val ctx = spark.sqlContext
    val in = MemoryStream[Rec]
    val q = CustomState.streamingDedup(in.toDF(), "ts", "10 seconds", Seq("id"))
      .writeStream.format("memory").queryName("sdedup").outputMode("append").start()
    try {
      in.addData(Rec(1, "a", new Timestamp(base)), Rec(2, "b", new Timestamp(base + 100)))
      q.processAllAvailable()
      in.addData(Rec(1, "a-again", new Timestamp(base + 200)))  // duplicate id
      in.addData(Rec(3, "c", new Timestamp(base + 300)))
      q.processAllAvailable()
      val ids = spark.table("sdedup").select("id").as[Long].collect().sorted
      assert(ids.toSeq === Seq(1L, 2L, 3L))
    } finally q.stop()
  }

  test("emit-on-change suppresses repeated values, emits transitions") {
    implicit val ctx = spark.sqlContext
    val in = MemoryStream[(String, String)]
    val q = CustomState.emitOnChange(in.toDS())
      .toDF("key", "value")
      .writeStream.format("memory").queryName("eoc").outputMode("update").start()
    try {
      in.addData(("k1", "v1")); q.processAllAvailable()
      in.addData(("k1", "v1")); q.processAllAvailable()   // no change → no emit
      in.addData(("k1", "v2")); q.processAllAvailable()   // change → emit
      in.addData(("k2", "x")); q.processAllAvailable()
      val rows = spark.table("eoc").as[(String, String)].collect().toSeq
      assert(rows.count(_ == ("k1", "v1")) === 1)
      assert(rows.count(_ == ("k1", "v2")) === 1)
      assert(rows.count(_._1 == "k2") === 1)
    } finally q.stop()
  }
}
