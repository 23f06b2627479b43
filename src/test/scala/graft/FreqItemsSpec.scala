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
}
