package graft

import org.apache.spark.sql.functions._

class ProfileSpec extends SparkSpec {
  import spark.implicits._

  test("profile counts nulls and distincts per column, one row per column") {
    val df = Seq(
      (Some(1L), Some("a")), (Some(2L), None), (Some(2L), Some("b")),
      (None, Some("a"))).toDF("k", "s")
    val p = graft.ops.Profile.columns(df, Seq("k", "s"), approxDistinct = false)
      .collect().map(r => r.getString(0) -> r).toMap
    assert(p("k").getLong(1) === 4L && p("k").getLong(2) === 1L && p("k").getLong(3) === 2L)
    assert(p("k").getString(4) === "1" && p("k").getString(5) === "2")
    assert(p("s").getLong(2) === 1L && p("s").getLong(3) === 2L)
    assert(p("s").getString(4) === "a" && p("s").getString(5) === "b")
  }

  test("approx path replaces Expand with mergeable HLL sketches, NDV close") {
    val df = (1L to 5000L).map(i => (i, i % 700)).toDF("a", "b")
    val approx = graft.ops.Profile.columns(df, Seq("a", "b"))
    val plan = approx.queryExecution.executedPlan.toString
    assert(!plan.contains("Expand"),
      "approx profile must not multiply the scan through Expand")
    val nd = approx.collect().map(r => r.getString(0) -> r.getLong(3)).toMap
    assert(math.abs(nd("a") - 5000L) <= 500, s"HLL NDV off: ${nd("a")}")
    assert(math.abs(nd("b") - 700L) <= 70, s"HLL NDV off: ${nd("b")}")
    // exact mode pays the Expand — the documented trade
    val exact = graft.ops.Profile.columns(df, Seq("a", "b"), approxDistinct = false)
    assert(exact.queryExecution.executedPlan.toString.contains("Expand"))
  }
}
