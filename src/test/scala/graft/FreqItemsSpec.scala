package graft

import org.apache.spark.sql.functions._
import graft.functions.FreqItems

class FreqItemsSpec extends SparkSpec {
  import spark.implicits._

  private def sketch(items: Seq[String], k: Int, parts: Int): Map[String, Long] =
    items.toDF("item").repartition(parts)
      .agg(FreqItems.heavyHitters(k)(col("item")).as("hh"))
      .as[Map[String, Long]].head()

  test("exact when distinct items never exceed k") {
    val items = Seq.fill(40)("a") ++ Seq.fill(25)("b") ++ Seq.fill(3)("c")
    for (parts <- Seq(1, 3, 7)) {
      assert(sketch(items, k = 8, parts) === Map("a" -> 40L, "b" -> 25L, "c" -> 3L))
    }
  }

  test("eviction mode: every item above n/(k+1) survives, counts undercount by <= n/(k+1)") {
    val rnd = new scala.util.Random(11)
    // 2 heavy items in a sea of 400 distinct light ones
    val items = rnd.shuffle(
      Seq.fill(600)("heavy1") ++ Seq.fill(400)("heavy2") ++
        Seq.tabulate(1000)(i => s"light${i % 400}"))
    val n = items.size
    val k = 50
    val truth = items.groupBy(identity).map { case (i, xs) => (i, xs.size.toLong) }
    for (parts <- Seq(1, 4)) {
      val mg = sketch(items, k, parts)
      assert(mg.size <= k)
      assert(mg.contains("heavy1") && mg.contains("heavy2"),
        s"items above n/(k+1)=${n / (k + 1)} must be present")
      mg.foreach { case (item, est) =>
        val t = truth(item)
        assert(est <= t, s"$item overcounted: $est > $t")
        assert(t - est <= n / (k + 1), s"$item undercounted past the bound")
      }
    }
  }

  test("count-min: never undercounts, exact at low load, merge-invariant") {
    import org.apache.spark.sql.functions._
    val (depth, width) = (4, 256)
    // zipf-ish stream: item i appears 1000/i times, i in 1..50
    val rows = (1L to 50L).flatMap(i => Seq.fill((1000 / i).toInt)(i))
    val df = rows.toDF("item")
    val truth = rows.groupBy(identity).view.mapValues(_.size.toLong).toMap
    def skOf(d: org.apache.spark.sql.DataFrame): Seq[Long] =
      d.agg(graft.functions.CountMin.sketch(depth, width)(col("item")).as("sk"))
        .as[Seq[Long]].head()
    val sk = skOf(df)
    val n = rows.size
    truth.foreach { case (item, cnt) =>
      val est = graft.functions.CountMin.estimate(sk, depth, width, item)
      assert(est >= cnt, s"undercount for $item: $est < $cnt")
      assert(est <= cnt + (3.0 * n / width).toLong + 1,
        s"overcount beyond bound for $item: $est vs $cnt (n=$n)")
    }
    // an item never seen estimates near zero (only collision mass)
    val phantom = graft.functions.CountMin.estimate(sk, depth, width, 999999L)
    assert(phantom <= (3.0 * n / width).toLong + 1, s"phantom $phantom")
    // element-wise merge ⇒ layout invariance
    assert(skOf(df.repartition(7)) === sk)
  }

  test("null items are ignored") {
    val mg = Seq(Some("a"), None, Some("a"), None).toDF("item")
      .agg(FreqItems.heavyHitters(4)(col("item")).as("hh"))
      .as[Map[String, Long]].head()
    assert(mg === Map("a" -> 2L))
  }

  test("partial-aggregates map-side (sketch, not a per-item shuffle)") {
    val p = Seq("a", "b").toDF("item")
      .agg(FreqItems.heavyHitters(4)(col("item")))
      .queryExecution.executedPlan.toString
    assert(p.contains("partial_misragries") || p.contains("ObjectHashAggregate"), p.take(600))
  }

  test("the mergeable sketch IS the streaming state: stream agg ≡ batch agg") {
    // a mergeable summary needs no custom stateful operator on a stream —
    // the same udaf runs as a streaming aggregation, its buffer carried in
    // the state store between micro-batches. Distinct items ≤ k here, so no
    // eviction fires and the result is exactly the batch map (the same
    // regime the DuckDB oracle row pins for the batch op).
    implicit val ctx = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val input = MemoryStream[String]
    val q = input.toDF().toDF("item")
      .groupBy().agg(FreqItems.heavyHitters(8)(col("item")).as("hh"))
      .writeStream.format("memory").queryName("mg_stream")
      .outputMode("complete").start()
    try {
      val items = Seq("a", "a", "b", "c", "a", "b", "d", "a", "e", "b")
      input.addData(items.take(4): _*); q.processAllAvailable()
      input.addData(items.drop(4): _*); q.processAllAvailable()
      val streamed = spark.table("mg_stream").as[Map[String, Long]].head()
      val batch = items.toDF("item")
        .agg(FreqItems.heavyHitters(8)(col("item")).as("hh"))
        .as[Map[String, Long]].head()
      assert(streamed == batch)
      assert(streamed == Map("a" -> 4L, "b" -> 3L, "c" -> 1L, "d" -> 1L, "e" -> 1L))
    } finally q.stop()
  }

  test("streaming sketch under eviction still keeps every true heavy hitter") {
    implicit val ctx = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val input = MemoryStream[String]
    val q = input.toDF().toDF("item")
      .groupBy().agg(FreqItems.heavyHitters(3)(col("item")).as("hh"))
      .writeStream.format("memory").queryName("mg_stream_evict")
      .outputMode("complete").start()
    try {
      // 40 "hot" + 24 singletons over k=3 counters: hot count 40 > n/(k+1)=16
      val items = new scala.util.Random(7).shuffle(
        Seq.fill(40)("hot") ++ (1 to 24).map(i => s"rare$i"))
      items.grouped(16).foreach { g => input.addData(g: _*); q.processAllAvailable() }
      val sk = spark.table("mg_stream_evict").as[Map[String, Long]].head()
      assert(sk.contains("hot"), s"true heavy hitter evicted: $sk")
      assert(sk("hot") <= 40 && sk("hot") >= 40 - 64 / 4, s"count bound violated: $sk")
      assert(sk.size <= 3, s"memory bound violated: $sk")
    } finally q.stop()
  }
}
