package graft

import org.apache.spark.sql.functions._
import graft.ops.Pca

/** PCA: covariance-sums exactness, Jacobi correctness, projection
  * semantics, persistence round-trip, layout-invariance.
  */
class PcaSpec extends SparkSpec {
  import spark.implicits._

  private def dot(a: Seq[Double], b: Seq[Double]): Double =
    a.zip(b).map { case (x, y) => x * y }.sum

  test("covariance sums are exact integers matching a local replica") {
    val vecs = (1L to 50L).map { i =>
      (i, Seq(math.sin(i.toDouble).toFloat, math.cos(i.toDouble).toFloat,
        (i % 5).toFloat / 4))
    }
    val df = vecs.toDF("id", "vec")
    val rows = Pca.covarianceSums(df, "vec", dim = 3, scale = 1000)
      .as[(Int, Int, Long, Long, Long, Long)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4, r._5, r._6))).toMap
    // local integer replica with the identical quantization
    val q = vecs.map(_._2.map(x => math.floor(x.toDouble * 1000).toLong))
    for (i <- 0 until 3; j <- i until 3) {
      val sI = q.map(_(i)).sum
      val sJ = q.map(_(j)).sum
      val sp = q.map(v => v(i) * v(j)).sum
      assert(rows((i, j)) === ((50L, sI, sJ, sp)), s"pair ($i,$j)")
    }
    // layout-invariant (exact integers — must be identical, not close)
    val again = Pca.covarianceSums(df.repartition(7), "vec", 3)
      .as[(Int, Int, Long, Long, Long, Long)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4, r._5, r._6))).toMap
    assert(again === rows)
  }

  test("jacobi recovers a known eigensystem") {
    // symmetric matrix with known spectrum: diag(5, 2) rotated by 30°
    val c = math.cos(math.Pi / 6); val s = math.sin(math.Pi / 6)
    val m = Array(
      Array(5 * c * c + 2 * s * s, (5 - 2) * s * c),
      Array((5 - 2) * s * c, 5 * s * s + 2 * c * c))
    val (eig, vecs) = Pca.jacobiEigen(m)
    val sorted = eig.sorted.reverse
    assert(math.abs(sorted(0) - 5.0) < 1e-9 && math.abs(sorted(1) - 2.0) < 1e-9)
    // eigenvector check: m·v = λ·v
    eig.zip(vecs).foreach { case (l, v) =>
      val mv = m.map(row => row.zip(v).map { case (a, b) => a * b }.sum)
      mv.zip(v).foreach { case (got, vi) => assert(math.abs(got - l * vi) < 1e-9) }
    }
  }

  test("fit finds the dominant directions of a planted rank-2 corpus") {
    // points on a plane spanned by e0+e1 and e2, plus tiny noise in e3
    val rows = (1L to 400L).map { i =>
      val a = math.sin(i * 0.37) * 3
      val b = math.cos(i * 0.53) * 2
      (i, Seq((a / math.sqrt(2)).toFloat, (a / math.sqrt(2)).toFloat,
        b.toFloat, (((i % 7) - 3) / 3000.0).toFloat))
    }
    val df = rows.toDF("vec_id", "embedding")
    val model = Pca.fit(df, "embedding", dim = 4, k = 4)
    // eigenvalues descending; the top 2 dwarf the rest
    assert(model.eigenvalues === model.eigenvalues.sorted.reverse)
    assert(model.eigenvalues(1) > 100 * model.eigenvalues(2),
      s"rank-2 structure not found: ${model.eigenvalues}")
    // components orthonormal
    for (i <- 0 until 4; j <- i until 4) {
      val d = dot(model.components(i), model.components(j))
      if (i == j) assert(math.abs(d - 1.0) < 1e-9) else assert(math.abs(d) < 1e-9)
    }
    // top component lies in the planted plane: no e3 mass
    assert(math.abs(model.components(0)(3)) < 1e-3)
    // determinism across layouts (exact: integer sums + fixed Jacobi)
    val again = Pca.fit(df.repartition(13), "embedding", dim = 4, k = 4)
    assert(again === model)
  }

  test("whitened coordinates have unit variance; dead directions null out") {
    val rows = (1L to 500L).map { i =>
      (i, Seq((math.sin(i * 0.37) * 3).toFloat, (math.cos(i * 0.53) * 2).toFloat,
        (math.sin(i * 0.91) * 0.5).toFloat, 0.0f)) // last dim constant → λ≈0
    }
    val df = rows.toDF("vec_id", "embedding")
    val model = Pca.fit(df, "embedding", dim = 4, k = 4)
    val w = Pca.whiten(df, "vec_id", "embedding", model)
      .collect().map(r => (r.getLong(0), r.getInt(1)) -> Option(r.get(2))).toMap
    // live components: per-component sample variance of the whitened coord
    // is ~1 (the definition of whitening; floor6 + n=500 gives ~1±few %)
    (0 until 3).foreach { c =>
      val xs = rows.map(r => w((r._1, c)).get.asInstanceOf[Double])
      val mean = xs.sum / xs.length
      val varc = xs.map(x => (x - mean) * (x - mean)).sum / xs.length
      assert(math.abs(varc - 1.0) < 0.05, s"component $c variance $varc")
    }
    // the constant dimension is numerically dead: λ ≤ eps → NULL, never an
    // amplified-noise coordinate
    assert(model.eigenvalues(3) < 1e-9)
    assert(rows.forall(r => w((r._1, 3)).isEmpty))
  }

  test("projection matches a local replica and save/load round-trips") {
    val rows = (1L to 60L).map(i =>
      (i, Seq(math.sin(i * 1.1).toFloat, math.cos(i * 0.7).toFloat,
        (i % 9).toFloat / 8)))
    val df = rows.toDF("vec_id", "embedding")
    val model = Pca.fit(df, "embedding", dim = 3, k = 2)
    val path = java.nio.file.Files.createTempDirectory("graft_pca_").toString
    Pca.save(model, spark, path)
    val loaded = Pca.load(spark, path)
    assert(loaded === model)
    val proj = Pca.project(df, "vec_id", "embedding", loaded)
      .as[(Long, Int, Double)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    rows.foreach { case (id, v) =>
      val xc = v.map(_.toDouble).zip(model.mean).map { case (x, m) => x - m }
      model.components.zipWithIndex.foreach { case (c, ci) =>
        val expect = math.floor(xc.zip(c).map { case (x, w) => x * w }
          .foldLeft(0.0)(_ + _) * 1e6) / 1e6
        assert(math.abs(proj((id, ci)) - expect) < 1e-9, s"id=$id comp=$ci")
      }
    }
  }

  test("oversized dims fail loudly, not as executor OOM or driver stall") {
    val df = Seq((1L, Seq(1f, 2f))).toDF("id", "vec")
    assert(intercept[IllegalArgumentException] {
      new Pca.CovSums(Pca.MaxCovDim + 1)
    }.getMessage.contains("MaxCovDim"))
    assert(intercept[IllegalArgumentException] {
      Pca.fit(df, "vec", dim = Pca.MaxCovDim + 1, k = 2)
    }.getMessage.contains("MaxCovDim"))
    // past MaxEigenDim the subspace solver takes over — but its width is
    // bounded too: wanting hundreds of components there is a different
    // algorithm, and the request must fail loudly at plan time
    assert(intercept[IllegalArgumentException] {
      Pca.fit(df, "vec", dim = Pca.MaxEigenDim + 1, k = Pca.MaxPowerK + 1)
    }.getMessage.contains("MaxPowerK"))
  }

  test("powerEigen matches full Jacobi on the top-k of a dense spectrum") {
    // deterministic symmetric PSD matrix: M = B·Bᵀ/d from a hash fill —
    // dense, no planted structure, eigenvalues of varying separation
    val d = 48
    def mix(x: Long): Long = {
      var z = x + 0x9E3779B97F4A7C15L
      z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
      z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
      z ^ (z >>> 31)
    }
    val b = Array.tabulate(d, d)((i, j) => mix(i.toLong * d + j).toDouble / Long.MaxValue)
    val m = Array.tabulate(d, d)((i, j) =>
      (0 until d).map(t => b(i)(t) * b(j)(t)).sum / d)
    val k = 5
    val (pe, pv) = Pca.powerEigen(m, k)
    val (je, _) = Pca.jacobiEigen(m)
    val topJ = je.sorted.reverse.take(k)
    pe.zip(topJ).foreach { case (p, j) =>
      assert(math.abs(p - j) < 1e-8 * math.max(1.0, math.abs(j)),
        s"eigenvalue mismatch: power=${pe.toSeq} jacobi=${topJ.toSeq}")
    }
    // Ritz vectors are true eigenvectors: ‖M·v − λ·v‖ small, basis orthonormal
    pe.zip(pv).foreach { case (l, v) =>
      val mv = m.map(row => row.zip(v).map { case (a, x) => a * x }.sum)
      val resid = math.sqrt(mv.zip(v).map { case (got, vi) =>
        val e = got - l * vi; e * e }.sum)
      assert(resid < 1e-7, s"eigen residual $resid at lambda=$l")
    }
    for (i <- 0 until k; j <- i until k) {
      val dot = pv(i).zip(pv(j)).map { case (a, x) => a * x }.sum
      assert(math.abs(dot - (if (i == j) 1.0 else 0.0)) < 1e-9)
    }
  }

  test("fit routes d > MaxEigenDim through the subspace solver and finds planted structure") {
    val d = Pca.MaxEigenDim + 16
    // rank-2 corpus embedded in a wide space: components along e0+e1 and e2
    val rows = (1L to 120L).map { i =>
      val a = math.sin(i * 0.37) * 3
      val b = math.cos(i * 0.53) * 2
      val v = new Array[Float](d)
      v(0) = (a / math.sqrt(2)).toFloat; v(1) = (a / math.sqrt(2)).toFloat
      v(2) = b.toFloat
      (i, v.toSeq)
    }
    val model = Pca.fit(rows.toDF("vec_id", "embedding"), "embedding", dim = d, k = 3)
    assert(model.eigenvalues === model.eigenvalues.sorted.reverse)
    assert(model.eigenvalues(1) > 100 * math.max(model.eigenvalues(2), 1e-12),
      s"rank-2 structure not found: ${model.eigenvalues}")
    // top component concentrates on the e0+e1 diagonal
    val c0 = model.components(0)
    assert(math.abs(math.abs(c0(0)) - math.abs(c0(1))) < 1e-6)
    assert(math.abs(c0(0)) > 0.7 && c0.drop(3).forall(x => math.abs(x) < 1e-6))
  }

  test("null embedding vectors are filtered, not NPE'd") {
    val df = Seq((1L, Seq(1f, 2f)), (2L, null.asInstanceOf[Seq[Float]]),
      (3L, Seq(3f, 4f))).toDF("id", "vec")
    val n = Pca.covarianceSums(df, "vec", dim = 2).select("n").as[Long].collect()
    assert(n.forall(_ === 2L), "the null row must be dropped from the sums")
    val model = Pca.fit(df, "vec", dim = 2, k = 1)
    assert(model.components.nonEmpty)
  }

  test("native centered-dot project/whiten ≡ the broadcast-join reference forms") {
    // r21: project/whiten compute per-row arrays of native CenteredDots
    // + posexplode instead of a broadcast crossJoin over a component
    // frame with an interpreted zip_with centering — same rows, same
    // floor6 doubles, including the NULL coordinate rows of dead (λ ≤ ε)
    // components
    val e = Tables.embeddings(spark, sf())
    val model = Pca.fit(e, "embedding", 64, k = 4)
    val deadModel = model.copy(eigenvalues = Seq(model.eigenvalues.head, 0.0,
      model.eigenvalues(2), model.eigenvalues(3)))
    val pk = Pca.project(e, "vec_id", "embedding", model)
    val pr = Pca.projectRef(e, "vec_id", "embedding", model)
    assert(pk.exceptAll(pr).isEmpty && pr.exceptAll(pk).isEmpty,
      "project kernel/reference divergence")
    for (m <- Seq(model, deadModel)) {
      val wk = Pca.whiten(e, "vec_id", "embedding", m)
      val wr = Pca.whitenRef(e, "vec_id", "embedding", m)
      assert(wk.exceptAll(wr).isEmpty && wr.exceptAll(wk).isEmpty,
        "whiten kernel/reference divergence")
    }
  }

  test("vector forms agree with the exploded project/whiten value-for-value") {
    val df = (1L to 30L).map(i =>
        (i, Seq.tabulate(4)(j => (math.sin(i * 0.9 + j) * (j + 1)).toFloat)))
      .toDF("vec_id", "embedding")
    val model = Pca.fit(df, "embedding", dim = 4, k = 3)
    assert(model.eigenvalues.forall(_ > 1e-12), "fixture must have no dead directions")
    val pv = Pca.projectVector(df, "vec_id", "embedding", model)
      .as[(Long, Seq[Double])].collect().toMap
    val pe = Pca.project(df, "vec_id", "embedding", model)
      .as[(Long, Int, Double)].collect()
      .groupBy(_._1).map { case (id, rs) => id -> rs.sortBy(_._2).map(_._3).toSeq }
    assert(pv === pe)
    val wv = Pca.whitenVector(df, "vec_id", "embedding", model)
      .as[(Long, Seq[Double])].collect().toMap
    val we = Pca.whiten(df, "vec_id", "embedding", model)
      .as[(Long, Int, Double)].collect()
      .groupBy(_._1).map { case (id, rs) => id -> rs.sortBy(_._2).map(_._3).toSeq }
    assert(wv === we)
  }

  test("whitenVector refuses an all-dead model") {
    val df = Seq((1L, Seq(1f, 1f))).toDF("vec_id", "embedding")
    val dead = Pca.PcaModel(Seq(1.0, 1.0), Seq(0.0, 0.0),
      Seq(Seq(1.0, 0.0), Seq(0.0, 1.0)))
    assert(intercept[IllegalArgumentException] {
      Pca.whitenVector(df, "vec_id", "embedding", dead)
    }.getMessage.contains("dead"))
  }
}
