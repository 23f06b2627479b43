package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.streaming.StreamJoins
import graft.streaming.StreamJoins.{EnrichedFact, Fact, TableUpdate}

/** Live stream⋈table join (KStream⋈KTable shape): facts enrich against a
  * changelog that updates concurrently — timestamp-synchronized within a
  * micro-batch, current-table across batches, one (ts, value) state pair
  * per key.
  */
class StreamTableJoinSpec extends SparkSpec {
  import spark.implicits._

  /** `setup` runs BEFORE the query starts: data added there is guaranteed
    * to land in the FIRST micro-batch (the default trigger polls
    * continuously, so adding two sources' data after start can split them
    * across batches nondeterministically).
    */
  private def run(setup: (MemoryStream[Fact], MemoryStream[TableUpdate]) => Unit = (_, _) => ())(
      f: (MemoryStream[Fact], MemoryStream[TableUpdate],
          org.apache.spark.sql.streaming.StreamingQuery) => Unit): Unit = {
    implicit val ctx = spark.sqlContext
    val facts = MemoryStream[Fact]
    val updates = MemoryStream[TableUpdate]
    setup(facts, updates)
    val q = StreamJoins.streamTableJoin(facts.toDS(), updates.toDS())
      .writeStream.format("memory").queryName("stj").outputMode("update").start()
    try f(facts, updates, q) finally q.stop()
  }

  private def table(): Seq[EnrichedFact] =
    spark.table("stj").as[EnrichedFact].collect().toSeq

  test("within one batch, facts see the latest update at-or-before their own ts") {
    // update@10=a, update@30=b, facts at 5 / 10 / 20 / 30 — ONE batch
    // (added before start)
    run(setup = (facts, updates) => {
      updates.addData(TableUpdate("k", 10L, "a"), TableUpdate("k", 30L, "b"))
      facts.addData(Fact("k", 5L, "f5"), Fact("k", 10L, "f10"),
        Fact("k", 20L, "f20"), Fact("k", 30L, "f30"))
    }) { (facts, updates, q) =>
      q.processAllAvailable()
      val by = table().map(e => e.ts -> e.value).toMap
      assert(by === Map(5L -> None, 10L -> Some("a"), 20L -> Some("a"),
        30L -> Some("b")), "event-time sync incl. the at-equal-ts visibility rule")
    }
  }

  test("across batches facts see the current table (KS replay), late updates ignored") {
    run() { (facts, updates, q) =>
      updates.addData(TableUpdate("k", 100L, "v1")); q.processAllAvailable()
      facts.addData(Fact("k", 50L, "old-fact")); q.processAllAvailable()
      // cross-batch: the fact's ts is OLDER than the table's — it still
      // sees the current value (reprocessing semantics)
      assert(table().find(_.payload == "old-fact").get.value === Some("v1"))
      updates.addData(TableUpdate("k", 90L, "stale")); q.processAllAvailable()
      facts.addData(Fact("k", 200L, "new-fact")); q.processAllAvailable()
      assert(table().find(_.payload == "new-fact").get.value === Some("v1"),
        "an update older than the key's state must not regress the table")
      updates.addData(TableUpdate("k", 300L, "v2")); q.processAllAvailable()
      facts.addData(Fact("k", 400L, "after")); q.processAllAvailable()
      assert(table().find(_.payload == "after").get.value === Some("v2"))
    }
  }

  test("keys never updated enrich to None; keys are independent") {
    run() { (facts, updates, q) =>
      updates.addData(TableUpdate("k1", 10L, "a"))
      facts.addData(Fact("k1", 20L, "f1"), Fact("k2", 20L, "f2"))
      q.processAllAvailable()
      val by = table().map(e => e.key -> e.value).toMap
      assert(by === Map("k1" -> Some("a"), "k2" -> None))
    }
  }

  test("transformWithState twin matches the flatMapGroupsWithState semantics") {
    implicit val ctx = spark.sqlContext
    val prevProvider = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val facts = MemoryStream[Fact]
    val updates = MemoryStream[TableUpdate]
    facts.addData(Fact("k", 5L, "f5"), Fact("k", 20L, "f20"))
    updates.addData(TableUpdate("k", 10L, "a"))
    val q = StreamJoins.streamTableJoinTws(facts.toDS(), updates.toDS())
      .writeStream.format("memory").queryName("stj_tws").outputMode("update").start()
    try {
      q.processAllAvailable()
      // batch 2: replay (old fact sees the current table) + advance
      updates.addData(TableUpdate("k", 30L, "b")); q.processAllAvailable()
      facts.addData(Fact("k", 15L, "late"), Fact("k", 40L, "f40")); q.processAllAvailable()
      val by = spark.table("stj_tws").as[EnrichedFact].collect()
        .map(e => e.payload -> e.value).toMap
      assert(by === Map("f5" -> None, "f20" -> Some("a"),
        "late" -> Some("b"), "f40" -> Some("b")))
    } finally {
      q.stop()
      prevProvider match {
        case Some(p) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }
}
