package graft

import graft.ops.KMeans

/** Quantized k-means semantics on hand fixtures: separated clusters are
  * recovered, all-duplicate input collapses to one cluster with the empty
  * clusters keeping their init centroids, and distances are exact integer
  * micro-unit sums.
  */
class KMeansSpec extends SparkSpec {
  import spark.implicits._

  test("two separated clusters are recovered from in-cluster inits") {
    // ids 0,1 are the k=2 init seeds, one per true cluster
    val pts = Seq(
      (0L, Array(0.0f, 0.1f)), (2L, Array(0.1f, 0.0f)), (3L, Array(-0.1f, 0.05f)),
      (1L, Array(5.0f, 5.1f)), (4L, Array(5.1f, 5.0f)), (5L, Array(4.9f, 5.05f))
    ).toDF("vec_id", "embedding")
    val out = KMeans.fitAssign(pts, "embedding", "vec_id", k = 2, rounds = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out === Map(0L -> 0L, 2L -> 0L, 3L -> 0L, 1L -> 1L, 4L -> 1L, 5L -> 1L))
  }

  test("all-duplicate input: ties break to cluster 0, empty clusters persist") {
    val p = Array(0.5f, -0.5f, 0.25f)
    val pts = (0L to 4L).map(i => (i, p)).toDF("vec_id", "embedding")
    val out = KMeans.fitAssign(pts, "embedding", "vec_id", k = 3, rounds = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.forall { case (_, c, d2) => c == 0L && d2 == 0L })
    // the two starved clusters kept their (identical) init centroids
    val cents = KMeans.fitCentroids(pts, "embedding", "vec_id", k = 3, rounds = 2)
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(cents.keySet === Set(0L, 1L, 2L))
    assert(cents.values.toSeq.distinct.size === 1)
  }

  test("d2 is the exact integer micro-unit squared distance") {
    // point (0.001, 0) vs centroid at itself → 0; vs (0.002, 0) → 1 milli² = 1
    val pts = Seq((0L, Array(0.001f, 0.0f)), (1L, Array(0.002f, 0.0f)))
      .toDF("vec_id", "embedding")
    // k=2, rounds=0: assignment against the raw init centroids (the points)
    val out = KMeans.fitAssign(pts, "embedding", "vec_id", k = 2, rounds = 0)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(out === Set((0L, 0L, 0L), (1L, 1L, 0L)))
  }

  test("fitCentroids validates its arguments like fitAssign (no raw ArithmeticException)") {
    val pts = (0L to 7L).map(i => (i, Seq(i.toFloat))).toDF("vec_id", "embedding")
    assert(intercept[IllegalArgumentException] {
      graft.ops.KMeans.fitCentroids(pts, "embedding", "vec_id", k = 2, rounds = 2,
        checkpointInterval = 0)
    }.getMessage.contains("checkpointInterval"))
    assert(intercept[IllegalArgumentException] {
      graft.ops.KMeans.fitCentroids(pts, "embedding", "vec_id", k = 0)
    }.getMessage.contains("k="))
  }

  test("centroid update floors toward negative infinity (engine-portable)") {
    // exactly-representable floats: q = -250, -250, -500 millis; mean
    // -333.33 → floor = -334 (toward -inf, not truncation's -333)
    val pts = Seq((0L, Array(-0.25f)), (1L, Array(-0.25f)), (2L, Array(-0.5f)))
      .toDF("vec_id", "embedding")
    val cents = KMeans.fitCentroids(pts, "embedding", "vec_id", k = 1, rounds = 1)
      .collect().map(r => r.getSeq[Long](1)).head
    assert(cents === Seq(-334L))
  }
}
