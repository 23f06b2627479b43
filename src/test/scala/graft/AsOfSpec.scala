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
}
