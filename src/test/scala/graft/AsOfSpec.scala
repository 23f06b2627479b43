package graft

import graft.ops.AsOf

/** Temporal as-of join semantics on a hand fixture: latest version
  * at-or-before wins, no-prior-version rows keep nulls, exact-timestamp
  * versions are visible, ties break deterministically.
  */
class AsOfSpec extends SparkSpec {
  import spark.implicits._

  private def left = Seq(
    (1L, "u1", 5L),   // before any version → nulls
    (2L, "u1", 15L),  // between versions → v@10
    (3L, "u1", 20L),  // exactly at a version ts → that version
    (4L, "u1", 99L),  // after all → latest
    (5L, "u2", 50L)   // key with no versions at all → nulls
  ).toDF("eid", "k", "ets")

  private def right = Seq(
    ("u1", 10L, "a"),
    ("u1", 20L, "b")
  ).toDF("k", "vts", "ver")

  test("as-of join picks the latest version at-or-before each event") {
    val out = AsOf.asOfJoin(left, right, "k", "ets", "vts")
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(4)) None else Some(r.getString(4)))).toMap
    assert(out === Map(1L -> None, 2L -> Some("a"), 3L -> Some("b"),
      4L -> Some("b"), 5L -> None))
  }

  test("version-timestamp ties break by full right-row ordering, not arbitrarily") {
    val tied = Seq(("u1", 10L, "x"), ("u1", 10L, "z"), ("u1", 10L, "y"))
      .toDF("k", "vts", "ver")
    val out = AsOf.asOfJoin(left.filter($"eid" === 2L), tied, "k", "ets", "vts")
      .select("ver").as[String].collect()
    assert(out.toSeq === Seq("z"), "max by (vts, ver) struct ordering")
  }

  test("overlapping non-key columns are rejected up front") {
    val e = intercept[IllegalArgumentException](
      AsOf.asOfJoin(left, right.withColumnRenamed("ver", "ets"), "k", "ets", "vts"))
    assert(e.getMessage.contains("share only the key"))
  }

  test("compact (union+window) form equals the join form row-for-row, ties included") {
    val churny = Seq(                       // 3 same-ts versions → tie-break must match
      ("u1", 10L, "x"), ("u1", 10L, "z"), ("u1", 10L, "y"),
      ("u1", 20L, "b"), ("u2", 60L, "late")  // u2@60 is AFTER u2's only fact → unmatched
    ).toDF("k", "vts", "ver")
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.select("eid", "k", "ets", "vts", "ver")
        .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
          if (r.isNullAt(3)) None else Some(r.getLong(3)),
          if (r.isNullAt(4)) None else Some(r.getString(4)))).sortBy(_._1).toSeq
    assert(canon(AsOf.asOfJoinCompact(left, churny, "k", "ets", "vts"))
      === canon(AsOf.asOfJoin(left, churny, "k", "ets", "vts")))
  }

  test("null timestamps / null keys: compact form still equals the join form") {
    // a null-vts version sorts nulls-FIRST in the window — unfiltered it
    // would enrich facts the equi-join form's vts <= ets predicate never
    // matches; null-ets facts and null-k rows are the same class of trap
    val nullyLeft = Seq(
      (1L, Some("u1"), Some(15L)), (2L, Some("u1"), None), // null event ts
      (3L, None, Some(15L))                                // null key
    ).toDF("eid", "k", "ets")
    val nullyRight = Seq(
      (Some("u1"), Some(10L), "v10"), (Some("u1"), None, "vnull"), // null version ts
      (None, Some(5L), "vkey")                                     // null key
    ).toDF("k", "vts", "ver")
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.select("eid", "k", "ets", "vts", "ver")
        .collect().map(r => (r.getLong(0),
          if (r.isNullAt(1)) None else Some(r.getString(1)),
          if (r.isNullAt(2)) None else Some(r.getLong(2)),
          if (r.isNullAt(3)) None else Some(r.getLong(3)),
          if (r.isNullAt(4)) None else Some(r.getString(4)))).sortBy(_._1).toSeq
    val viaJoin = canon(AsOf.asOfJoin(nullyLeft, nullyRight, "k", "ets", "vts"))
    val viaCompact = canon(AsOf.asOfJoinCompact(nullyLeft, nullyRight, "k", "ets", "vts"))
    assert(viaCompact === viaJoin)
    // and the semantics themselves: only the non-null row enriches
    assert(viaJoin === Seq(
      (1L, Some("u1"), Some(15L), Some(10L), Some("v10")),
      (2L, Some("u1"), None, None, None),
      (3L, None, Some(15L), None, None)))
  }

  test("compact form plans one hash exchange and no join") {
    val out = AsOf.asOfJoinCompact(left, right, "k", "ets", "vts")
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.toLowerCase.contains("join"),
      s"compact as-of must not plan a join:\n$plan")
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(exchanges === 1,
      s"expected exactly the one keyed window exchange, saw $exchanges:\n$plan")
  }
}
