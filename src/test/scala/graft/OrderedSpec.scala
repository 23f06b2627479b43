package graft

import graft.ops.Ordered
import org.apache.spark.sql.functions.col

/** Global rank/prefix-sum semantics: matches the single-window definition,
  * is invariant to the partition count (including more partitions than
  * rows), and handles a 1-row input.
  */
class OrderedSpec extends SparkSpec {
  import spark.implicits._

  // values chosen so sort order (v desc, k) differs from insertion order
  private def fixture = Seq(
    ("a", 5L), ("b", 9L), ("c", 1L), ("d", 9L), ("e", 3L),
    ("f", 7L), ("g", 2L), ("h", 8L), ("i", 4L), ("j", 6L)
  ).toDF("k", "v")

  private val expected = Seq( // (k, rank, cum) in (v desc, k) order
    ("b", 1L, 9L), ("d", 2L, 18L), ("h", 3L, 26L), ("f", 4L, 33L),
    ("j", 5L, 39L), ("a", 6L, 44L), ("i", 7L, 48L), ("e", 8L, 51L),
    ("g", 9L, 53L), ("c", 10L, 54L))

  private def run(parts: Int): Seq[(String, Long, Long)] =
    Ordered.rankedPrefixSum(fixture, Seq(col("v").desc, col("k")), col("v"), parts)
      .select("k", "rank", "cum").as[(String, Long, Long)]
      .collect().sortBy(_._2).toSeq

  test("matches the single-window definition") {
    assert(run(3) === expected)
  }

  test("partition count does not change the result (incl. empty partitions)") {
    assert(run(1) === expected)
    assert(run(7) === expected)
    assert(run(32) === expected) // more partitions than rows
  }

  test("single row gets rank 1, cum = its value") {
    val out = Ordered.rankedPrefixSum(Seq(("x", 42L)).toDF("k", "v"),
      Seq(col("v")), col("v")).select("k", "rank", "cum")
      .as[(String, Long, Long)].collect().toSeq
    assert(out === Seq(("x", 1L, 42L)))
  }
}
