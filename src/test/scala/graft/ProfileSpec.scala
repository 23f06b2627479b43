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

  import graft.ops.Profile.Expectation

  test("expectations: null predicate is a violation; thresholds decide passed") {
    val df = Seq[(java.lang.Long, String)]((1L, "a"), (2L, null), (null, "c"), (4L, "d"))
      .toDF("v", "s")
    val got = graft.ops.Profile.expectations(df, Seq(
      Expectation("v_present", col("v").isNotNull),
      Expectation("v_small", col("v") < 3, minPassFrac = 0.5),
      Expectation("s_present", col("s").isNotNull, minPassFrac = 0.75)))
      .as[(String, Long, Long, Long, Boolean)].collect()
      .map(r => r._1 -> r).toMap
    // v null on 1 of 4 rows
    assert(got("v_present") == (("v_present", 4L, 1L, 750000L, false)))
    // v < 3 true on rows 1,2; null row counts as violation → 2 of 4 pass
    assert(got("v_small") == (("v_small", 4L, 2L, 500000L, true)))
    // exactly at threshold passes (>=)
    assert(got("s_present") == (("s_present", 4L, 1L, 750000L, true)))
  }

  test("expectations: empty input passes vacuously") {
    val empty = Seq.empty[(Long, String)].toDF("v", "s")
    val got = graft.ops.Profile.expectations(empty,
      Seq(Expectation("v_present", col("v").isNotNull)))
      .as[(String, Long, Long, Long, Boolean)].collect()
    assert(got.toSeq == Seq(("v_present", 0L, 0L, 1000000L, true)))
  }

  test("expectations: duplicate check names rejected loudly") {
    val df = Seq((1L, "a")).toDF("v", "s")
    intercept[IllegalArgumentException] {
      graft.ops.Profile.expectations(df, Seq(
        Expectation("x", col("v").isNotNull), Expectation("x", col("s").isNotNull)))
    }
  }

  test("expectations: the whole suite is ONE aggregation pass, no joins") {
    val d = Tables.documents(spark, sf())
    val p = SparkEntry.queries("quality_expectations")(spark, sf())
      .queryExecution.executedPlan.toString
    assert(!p.contains("Join"), "expectation suite must not join")
    // one scan: the documents parquet appears exactly once in the plan
    assert("documents\\.parquet".r.findAllIn(p).size <= 1,
      "expectation suite re-scanned the input")
  }
}
