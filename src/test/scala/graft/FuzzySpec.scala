package graft

import org.apache.spark.sql.functions._

class FuzzySpec extends SparkSpec {
  import spark.implicits._

  private val people = Seq(
    (1L, "jon smith"), (2L, "john smith"), (3L, "john smyth"),
    (4L, "jane doe"), (5L, "jane roe"),
    (6L, "zachary taylor")).toDF("id", "name")

  test("blocked edit pairs: within-block only, distance band respected") {
    // block on first letter: j-block holds 1,2,3,4,5; z-block holds 6
    val pairs = graft.ops.Fuzzy.blockedEditPairs(people, "name", "id",
        substring(col("name"), 1, 1), maxDist = 2, minDist = 1)
      .as[(Long, Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L, 1L)))  // jon→john: one insert
    assert(pairs.contains((2L, 3L, 1L)))  // smith→smyth: one sub
    assert(pairs.contains((1L, 3L, 2L)))
    assert(pairs.contains((4L, 5L, 1L)))  // doe→roe
    // jane doe vs jon smith: distance > 2, excluded even though same block
    assert(!pairs.exists(p => p._1 == 4L && p._2 < 4L))
    assert(!pairs.exists(p => p._2 == 6L), "singleton block can't pair")
  }

  test("minDist=1 excludes exact duplicates; minDist=0 includes them") {
    val withDup = people.union(Seq((7L, "jon smith")).toDF("id", "name"))
    val strict = graft.ops.Fuzzy.blockedEditPairs(withDup, "name", "id",
      substring(col("name"), 1, 1), maxDist = 2, minDist = 1)
    assert(!strict.filter(col("dist") === 0).as[(Long, Long, Long)].collect().exists(_ => true))
    val loose = graft.ops.Fuzzy.blockedEditPairs(withDup, "name", "id",
      substring(col("name"), 1, 1), maxDist = 2, minDist = 0)
    assert(loose.filter(col("dist") === 0).as[(Long, Long, Long)].collect()
      .toSet === Set((1L, 7L, 0L)))
  }

  test("goldenRecords: newest non-null wins, all-null stays null") {
    val rows = Seq(
      // cluster A: newest (pri 3) has null brand → brand falls back to pri 2
      ("A", 1L, Some("b1"), Some(10)),
      ("A", 2L, Some("b2"), None),
      ("A", 3L, None, Some(30)),
      // cluster B: single row, all null attribute
      ("B", 4L, None, Some(40)),
      ("B", 5L, None, None)).toDF("cluster", "pri", "brand", "size")
    val g = graft.ops.Fuzzy.goldenRecords(rows.toDF(), "cluster", "pri",
      Seq("brand", "size"))
      .collect().map(r => r.getString(0) ->
        (Option(r.get(1)), Option(r.get(2)), r.getLong(3))).toMap
    assert(g("A") === ((Some("b2"), Some(30), 3L)))
    assert(g("B") === ((None, Some(40), 2L)))
    // layout-independent
    val again = graft.ops.Fuzzy.goldenRecords(rows.toDF().repartition(5),
      "cluster", "pri", Seq("brand", "size"))
      .collect().map(r => r.getString(0) ->
        (Option(r.get(1)), Option(r.get(2)), r.getLong(3))).toMap
    assert(again === g)
  }

  test("hot-block cap thins a poison block, leaves sane blocks exact") {
    // poison block: 40 near-identical names under one blocking key, plus a
    // small healthy block — the degenerate-key scenario the cap exists for
    val poison = (1L to 40L).map(i => (i, f"aacme corp $i%02d"))
    val sane = Seq((100L, "zeta llc"), (101L, "zeta lcc"), (102L, "zeta ltd"))
    val df = (poison ++ sane).toDF("id", "name")
    val blk = substring(col("name"), 1, 1)
    def pairs(maxBlock: Int) =
      graft.ops.Fuzzy.blockedEditPairs(df, "name", "id", blk,
        maxDist = 4, minDist = 1, maxBlock = maxBlock)
        .as[(Long, Long, Long)].collect().toSet
    val uncapped = pairs(Int.MaxValue)
    val capped = pairs(4)
    // thinned pairs are a SUBSET with identical distances
    assert(capped.subsetOf(uncapped))
    assert(capped.size < uncapped.size, "the cap must actually thin the poison block")
    // the healthy z-block is untouched: all 3 of its pairs survive
    val zPairs = uncapped.filter(_._1 >= 100L)
    assert(zPairs.size === 3 && zPairs.subsetOf(capped))
    // deterministic across layouts
    val again = graft.ops.Fuzzy.blockedEditPairs(df.repartition(7), "name", "id", blk,
      maxDist = 4, minDist = 1, maxBlock = 4).as[(Long, Long, Long)].collect().toSet
    assert(again === capped)
    // the default cap (1000) is a no-op at this size — results stay exact
    assert(pairs(1000) === uncapped)
  }

  test("blockStats surfaces quadratic blocks largest-first") {
    val st = graft.ops.Fuzzy.blockStats(people, substring(col("name"), 1, 1))
      .as[(String, Long, Long)].collect()
    assert(st.head === (("j", 5L, 10L)))
    assert(st.last === (("z", 1L, 0L)))
  }
}
