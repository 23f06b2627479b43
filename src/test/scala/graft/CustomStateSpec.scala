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

  test("transformWithState twin of emit-on-change matches its semantics") {
    implicit val ctx = spark.sqlContext
    val prevProvider = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val in = MemoryStream[(String, String)]
    val q = CustomState.emitOnChangeTws(in.toDS())
      .toDF("k", "v")
      .writeStream.format("memory").queryName("eoc_tws").outputMode("update").start()
    try {
      in.addData(("k1", "v1")); q.processAllAvailable()
      in.addData(("k1", "v1")); q.processAllAvailable()   // no change → no emit
      in.addData(("k1", "v2")); q.processAllAvailable()   // change → emit
      in.addData(("k2", "x")); q.processAllAvailable()
      val rows = spark.table("eoc_tws").as[(String, String)].collect().toSeq
      assert(rows.count(_ == ("k1", "v1")) === 1)
      assert(rows.count(_ == ("k1", "v2")) === 1)
      assert(rows.count(_._1 == "k2") === 1)
    } finally {
      q.stop()
      prevProvider match {
        case Some(p) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("streaming golden record: newest non-null wins, late rows only fill gaps") {
    implicit val ctx = spark.sqlContext
    val in = MemoryStream[(String, Long, Map[String, String])]
    val q = CustomState.goldenRecordState(in.toDS())
      .toDF("key", "merged")
      .writeStream.format("memory").queryName("golden").outputMode("update").start()
    def latest(key: String): Map[String, String] = {
      val rows = spark.table("golden")
        .as[(String, Map[String, String])].collect().filter(_._1 == key)
      rows.last._2
    }
    try {
      in.addData(("e1", 1L, Map("brand" -> "b1", "size" -> "10")))
      q.processAllAvailable()
      assert(latest("e1") === Map("brand" -> "b1", "size" -> "10"))
      // newer row with a null-ish (absent) brand: size updates, brand kept
      in.addData(("e1", 3L, Map("size" -> "30")))
      q.processAllAvailable()
      assert(latest("e1") === Map("brand" -> "b1", "size" -> "30"))
      // LATE row (pri 2): must not overwrite pri-3 size, can fill new attrs
      in.addData(("e1", 2L, Map("size" -> "20", "color" -> "red")))
      q.processAllAvailable()
      assert(latest("e1") === Map("brand" -> "b1", "size" -> "30", "color" -> "red"))
      // no-change batch emits nothing new
      val n = spark.table("golden").count()
      in.addData(("e1", 2L, Map("size" -> "20")))
      q.processAllAvailable()
      assert(spark.table("golden").count() === n)
    } finally q.stop()
  }

  test("streaming weighted sample equals the batch A-ES sample after every batch") {
    implicit val ctx = spark.sqlContext
    // unique ids, two classes, mixed weights (incl. a non-positive one that
    // both sides must ignore)
    val rows = ((1L to 40L).map(i => ("a", i, (i % 7 + 1).toDouble)) ++
      (101L to 130L).map(i => ("b", i, (i % 5 + 1).toDouble)) :+ ("a", 999L, 0.0)).toVector
    val chunks = rows.grouped(25).toSeq
    val in = MemoryStream[(String, Long, Double)]
    val q = CustomState.weightedSampleState(in.toDS(), k = 5, salt = "p")
      .toDF("cls", "ver", "id", "prio")
      .writeStream.format("memory").queryName("wsample").outputMode("update").start()
    def streamed: Map[String, Set[Long]] = {
      val all = spark.table("wsample").as[(String, Long, Long, Long)].collect()
      all.groupBy(_._1).map { case (c, rs) =>
        val latest = rs.map(_._2).max
        c -> rs.filter(_._2 == latest).map(_._3).toSet
      }
    }
    def batch(prefix: Seq[(String, Long, Double)]): Map[String, Set[Long]] =
      graft.ops.Sampling.weightedPerClass(
        prefix.toDF("cls", "id", "w"), "cls", "id", "w", k = 5, salt = "p")
        .select("cls", "id").as[(String, Long)].collect()
        .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    try {
      var seen = Vector.empty[(String, Long, Double)]
      chunks.foreach { chunk =>
        in.addData(chunk)
        q.processAllAvailable()
        seen ++= chunk
        assert(streamed === batch(seen),
          s"stream/batch divergence after ${seen.size} rows")
      }
    } finally q.stop()
  }

  test("streaming token-budget gate: single batch equals the batch op, budget enforced across batches") {
    implicit val ctx = spark.sqlContext
    val rows = (1L to 60L).map(i => (if (i % 2 == 0) "a" else "b", i, 100L + (i % 7) * 10))
    // one-batch case: admitted set must equal the batch op's exactly
    val in1 = MemoryStream[(String, Long, Long)]
    val q1 = CustomState.tokenBudgetState(in1.toDS(), budget = 1500L, salt = "s0")
      .toDF("cls", "id", "n_tok", "cum")
      .writeStream.format("memory").queryName("tbgate1").outputMode("update").start()
    try {
      in1.addData(rows)
      q1.processAllAvailable()
      val streamed = spark.table("tbgate1").select("cls", "id")
        .as[(String, Long)].collect().toSet
      val batch = graft.ops.Sampling.tokenBudgetPerClass(
        rows.toDF("cls", "id", "toks"), "cls", "id", "toks", budget = 1500L, salt = "s0")
        .select("cls", "id").as[(String, Long)].collect().toSet
      assert(streamed === batch, "single-batch admission must equal the batch op")
    } finally q1.stop()
    // multi-batch case: totals never bust the budget (except a first doc),
    // and once a class is saturated later batches admit nothing
    val in2 = MemoryStream[(String, Long, Long)]
    val q2 = CustomState.tokenBudgetState(in2.toDS(), budget = 350L)
      .toDF("cls", "id", "n_tok", "cum")
      .writeStream.format("memory").queryName("tbgate2").outputMode("update").start()
    try {
      in2.addData(rows.take(30)); q2.processAllAvailable()
      in2.addData(rows.drop(30)); q2.processAllAvailable()
      val out = spark.table("tbgate2").as[(String, Long, Long, Long)].collect()
      out.groupBy(_._1).foreach { case (cls, rs) =>
        assert(rs.map(_._4).max <= 350L, s"$cls busts budget")
      }
      // a class whose first doc exceeds the budget still admits exactly it
      val in3 = MemoryStream[(String, Long, Long)]
      val q3 = CustomState.tokenBudgetState(in3.toDS(), budget = 10L)
        .toDF("cls", "id", "n_tok", "cum")
        .writeStream.format("memory").queryName("tbgate3").outputMode("update").start()
      try {
        in3.addData(("c", 1L, 999L), ("c", 2L, 999L)); q3.processAllAvailable()
        val c = spark.table("tbgate3").as[(String, Long, Long, Long)].collect()
        assert(c.length === 1 && c.head._3 === 999L)
      } finally q3.stop()
    } finally q2.stop()
  }

  test("streaming golden record persists a priority upgrade carrying the same value") {
    implicit val ctx = spark.sqlContext
    val in = MemoryStream[(String, Long, Map[String, String])]
    val q = CustomState.goldenRecordState(in.toDS())
      .toDF("key", "merged")
      .writeStream.format("memory").queryName("golden_pri").outputMode("update").start()
    def latest: Map[String, String] =
      spark.table("golden_pri").as[(String, Map[String, String])].collect().last._2
    try {
      in.addData(("e1", 5L, Map("brand" -> "b")))
      q.processAllAvailable()
      assert(latest === Map("brand" -> "b"))
      // same value at HIGHER priority: no emit (merged record unchanged)...
      val n = spark.table("golden_pri").count()
      in.addData(("e1", 9L, Map("brand" -> "b")))
      q.processAllAvailable()
      assert(spark.table("golden_pri").count() === n)
      // ...but the pri-9 claim must have been PERSISTED: a later pri-7 row
      // must lose to it, matching the batch twin (max_by keeps b at pri 9)
      in.addData(("e1", 7L, Map("brand" -> "c")))
      q.processAllAvailable()
      assert(spark.table("golden_pri").count() === n)
      assert(latest === Map("brand" -> "b"))
    } finally q.stop()
  }
}
