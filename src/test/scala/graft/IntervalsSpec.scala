package graft

import org.apache.spark.sql.functions._
import graft.ops.Intervals

class IntervalsSpec extends SparkSpec {
  import spark.implicits._

  private def naive(points: Seq[Long], ivs: Seq[(Long, Long, Long)]): Set[(Long, Long)] =
    (for {
      p <- points
      (id, s, e) <- ivs
      if p >= s && p < e
    } yield (p, id)).toSet

  private def bucketed(points: Seq[Long], ivs: Seq[(Long, Long, Long)],
      w: Long): Set[(Long, Long)] = {
    val pts = points.toDF("p")
    val iv = ivs.toDF("iv_id", "s", "e")
    Intervals.bucketedIntervalJoin(pts, "p", iv, "s", "e", w)
      .select(col("p"), col("iv_id"))
      .as[(Long, Long)].collect().toSet
  }

  test("matches the naive theta join, each pair exactly once") {
    val rnd = new scala.util.Random(7)
    // distinct point values so pair-set size == row count (the op is
    // per-ROW; duplicate values would collapse in the expected Set)
    val points = rnd.shuffle((0 until 10000).map(_.toLong)).take(300)
    val ivs = Seq.tabulate(40) { i =>
      val s = rnd.nextInt(9000).toLong
      (i.toLong, s, s + 1 + rnd.nextInt(800)) // lengths straddle the bucket width
    }
    val expected = naive(points, ivs)
    val pts = points.toDF("p")
    val iv = ivs.toDF("iv_id", "s", "e")
    val rows = Intervals.bucketedIntervalJoin(pts, "p", iv, "s", "e", 256)
      .select(col("p"), col("iv_id")).as[(Long, Long)].collect()
    assert(rows.length === expected.size, "a pair was duplicated or dropped")
    assert(rows.toSet === expected)
  }

  test("half-open semantics: start inclusive, end exclusive") {
    assert(bucketed(Seq(10L, 19L, 20L), Seq((1L, 10L, 20L)), 4) ===
      Set((10L, 1L), (19L, 1L)))
  }

  test("interval spanning many buckets still matches once per point") {
    assert(bucketed(Seq(0L, 999L), Seq((1L, 0L, 1000L)), 10) ===
      Set((0L, 1L), (999L, 1L)))
  }

  test("empty and inverted intervals match nothing") {
    assert(bucketed(Seq(5L), Seq((1L, 5L, 5L), (2L, 9L, 3L)), 4) === Set.empty)
  }

  test("oversized interval fails loudly instead of exploding the shuffle") {
    val e = intercept[Exception] {
      bucketed(Seq(1L), Seq((1L, 0L, 100000L)), 2,
      )
    }
    assert(e.getMessage.contains("buckets") || e.getCause != null)
  }

  test("plans a hash join on the bucket key, not a nested loop") {
    val pts = Seq(1L, 2L).toDF("p")
    val iv = Seq((1L, 0L, 10L)).toDF("iv_id", "s", "e")
    val p = Intervals.bucketedIntervalJoin(pts, "p", iv, "s", "e", 4)
      .queryExecution.executedPlan.toString
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"), p.take(600))
  }
}
