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

  test("native dist2 kernel ≡ builtin composition (nulls, mismatch, overflow)") {
    import org.apache.spark.sql.functions.col
    val rows = Seq(
      (Array[java.lang.Long](1L, 2L, 3L), Array[java.lang.Long](4L, 6L, 3L)),
      (Array[java.lang.Long](1L, null, 3L), Array[java.lang.Long](1L, 2L, 3L)),
      (Array[java.lang.Long](1L, 2L), Array[java.lang.Long](1L, 2L, 3L)),
      (null, Array[java.lang.Long](1L)),
      (Array[java.lang.Long](), Array[java.lang.Long]())
    ).toDF("a", "b")
    val got = rows.select(
      KMeans.dist2Kernel(col("a"), col("b")).as("k"),
      KMeans.dist2Ref(col("a"), col("b")).as("r")).collect()
    got.foreach { r =>
      assert((r.isNullAt(0) && r.isNullAt(1)) ||
        (!r.isNullAt(0) && !r.isNullAt(1) && r.getLong(0) == r.getLong(1)),
        s"kernel=${if (r.isNullAt(0)) null else r.getLong(0)} " +
          s"ref=${if (r.isNullAt(1)) null else r.getLong(1)}")
    }
    // overflow stays LOUD, like the ANSI-mode builtin arithmetic: a wrap
    // would be a silently wrong argmin
    val over = Seq((Array[java.lang.Long](Long.MaxValue, 0L),
      Array[java.lang.Long](-2L, 0L))).toDF("a", "b")
    intercept[Exception] {
      over.select(KMeans.dist2Kernel(col("a"), col("b"))).collect()
    }
    intercept[Exception] {
      over.select(KMeans.dist2Ref(col("a"), col("b"))).collect()
    }
  }

  test("native floor-scale quantize ≡ the transform reference") {
    import org.apache.spark.sql.functions.col
    val e = Tables.embeddings(spark, sf())
    for (scale <- Seq(1000, 7)) {
      val k = KMeans.quantize(e, "embedding", "vec_id", scale)
      val r = KMeans.quantizeRef(e, "embedding", "vec_id", scale)
      assert(k.exceptAll(r).isEmpty && r.exceptAll(k).isEmpty,
        s"quantize kernel/reference divergence at scale=$scale")
    }
    // null vector propagates as a null q array in both forms
    val withNull = Seq((1L, Array(0.5f, -0.25f)), (2L, null))
      .toDF("vec_id", "embedding")
    val kn = KMeans.quantize(withNull, "embedding", "vec_id")
    val rn = KMeans.quantizeRef(withNull, "embedding", "vec_id")
    assert(kn.exceptAll(rn).isEmpty && rn.exceptAll(kn).isEmpty)
    assert(kn.where(col("vec_id") === 2 && col("q").isNull).count() === 1)
  }

  test("vector-sum update ≡ exploded reference update (real corpus + starved clusters)") {
    import org.apache.spark.sql.functions.col
    // real corpus: quantize + one assignment round, then both update forms
    val e = Tables.embeddings(spark, sf())
    val q = KMeans.quantize(e, "embedding", "vec_id")
    // k=4 init from the smallest ids, same as lloyd's round 1 input
    val init = q.orderBy(col("vec_id")).limit(4)
      .withColumn("c", org.apache.spark.sql.functions.row_number()
        .over(org.apache.spark.sql.expressions.Window.orderBy(col("vec_id")))
        .cast("long") - 1)
      .select(col("c"), col("q").as("cent"))
    // starved cluster: k=4 over a corpus that collapses to ≤2 real clusters
    // still must keep all 4 centroid rows (prev inherited)
    val assigned = q.crossJoin(org.apache.spark.sql.functions.broadcast(
        init.groupBy().agg(org.apache.spark.sql.functions.array_sort(
          org.apache.spark.sql.functions.collect_list(
            org.apache.spark.sql.functions.struct(col("c"), col("cent")))).as("cs"))))
      .select(col("vec_id"), col("q"),
        org.apache.spark.sql.functions.array_min(
          org.apache.spark.sql.functions.transform(col("cs"), cc =>
            org.apache.spark.sql.functions.struct(
              KMeans.dist2Kernel(col("q"), cc.getField("cent")).as("d2"),
              cc.getField("c").as("c")))).getField("c").as("cluster"))
    val kern = KMeans.updateKernel(assigned, init)
    val ref = KMeans.updateRef(assigned, init)
    assert(kern.exceptAll(ref).isEmpty && ref.exceptAll(kern).isEmpty,
      "update kernel/reference divergence on the real corpus")
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
