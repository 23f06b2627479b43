package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Encoder, SparkSession}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._
import graft.ops.Text.floor6

/** Distributed PCA over an embedding column — the whitening/projection
  * step embedding pipelines run before clustering or semantic dedup (the
  * SemDeDup recipe itself PCA-whitens first).
  *
  * Scale design, Spark-first:
  *  - The ONLY distributed pass is a one-shot covariance-sums aggregation:
  *    a typed `Aggregator` whose buffer is (n, Σx [d], Σxxᵀ [d(d+1)/2]) —
  *    partial-aggregated map-side and merged associatively, so the shuffle
  *    carries ONE ~d²/2-long buffer per partition regardless of corpus
  *    size (d=64 → 2 KB·partitions). No row ever leaves its partition.
  *  - Coordinates are micro-quantized (`floor(x·scale)`, the [[KMeans]]
  *    contract), so every sum is an EXACT integer — layout- and
  *    engine-independent, hence the DuckDB oracle hash-matches the raw
  *    sums bit-for-bit. Overflow headroom: |q| ≤ scale·max|x| (~2¹²
  *    for unit-ish embeddings at scale=1000), so Σ products hold to
  *    ~2³⁹ rows per partition tree — beyond any real corpus.
  *  - The eigendecomposition runs DRIVER-SIDE on the d×d covariance —
  *    d is a model constant, never data-sized, the same bounded-collect
  *    contract as [[Ivf.load]]'s centroid table. Full cyclic Jacobi
  *    (deterministic sweep order) to d ≤ [[MaxEigenDim]]; past that, up to
  *    [[MaxCovDim]], a top-k SUBSPACE ITERATION ([[powerEigen]], O(k·d²)
  *    per iterate + a k×k Rayleigh–Ritz solve) — embedding-width d=2048/
  *    4096 fits solve in seconds for the few components callers want.
  *    Both halves stay HARD-BOUNDED: the covariance pass refuses
  *    d > [[MaxCovDim]] (buffer is d²/2 longs per partial) and the
  *    subspace width is capped at [[MaxPowerK]]. Oversized dims fail
  *    loudly at plan time, not as an executor OOM or a driver stall.
  *  - Projection is a broadcast join of the k components against the
  *    corpus: per-row center + dot — embarrassingly parallel, ranked by
  *    the same codegen'd [[graft.functions.Native.dot]] the ANN paths use.
  *
  * Persistence mirrors [[Ivf.save]]: mean + components land in parquet so
  * external readers (and the driver's DuckDB oracle) replay the projection
  * from the SAME doubles instead of re-deriving them in their own
  * summation order.
  */
object Pca {

  /** Hard ceiling on the covariance dimension: the aggregation buffer is
    * d(d+1)/2 longs PER PARTIAL, so d=4096 is already a ~67 MB map-side
    * buffer (and a ~67 MB shuffle block per partition). Past that an
    * executor OOMs silently mid-aggregation — this bound turns an oversized
    * dim into a loud, immediate error instead (the audit-first discipline
    * of maxBucket/maxBlock/maxCluster). For d > 4096, project down first
    * or switch to a blocked/sketched covariance.
    */
  val MaxCovDim = 4096

  /** Ceiling for the DRIVER-side FULL Jacobi eigensolve in [[fit]]: cyclic
    * Jacobi is O(d³) per sweep (up to 100 sweeps), so d=1024 is already
    * ~10¹¹ driver flops worst-case — minutes, not hours; d=4096 would be
    * ~7·10¹² — hours. Practical sweet spot is d ≤ 256 (embedding PCA runs
    * on pooled/truncated dims). Past [[MaxEigenDim]] — up to [[MaxCovDim]]
    * — [[fit]] switches to [[powerEigen]], a top-k subspace iteration at
    * O(k·d²) per iterate: the k components a PCA caller actually wants
    * never need the full spectrum, so d=4096/k=8 is ~10⁸ flops per iterate
    * instead of Jacobi's 10¹²-flop sweeps.
    */
  val MaxEigenDim = 1024

  /** Subspace width ceiling for [[powerEigen]]: k·d² per iterate means
    * k=128/d=4096 is ~2·10⁹ flops per iterate — seconds; far past that the
    * driver solve stops being "model-constant work". Wanting hundreds of
    * components at d > 1024 is a different algorithm (randomized SVD on
    * the distributed corpus), not a bigger loop.
    */
  val MaxPowerK = 128

  /** Covariance-sums buffer: (n, Σx per dim, upper-triangle Σxᵢxⱼ). */
  class CovSums(d: Int)
      extends Aggregator[Array[Long], (Long, Array[Long], Array[Long]), (Long, Array[Long], Array[Long])] {
    require(d > 0, s"need d > 0, got $d")
    require(d <= MaxCovDim,
      s"d=$d exceeds MaxCovDim=$MaxCovDim — the d(d+1)/2-long buffer would be " +
        f"~${d.toLong * (d + 1) / 2 * 8 / (1 << 20)}%d MB per partial; " +
        "reduce the dimension upstream or use a blocked covariance")
    private val tri = d * (d + 1) / 2
    override def zero: (Long, Array[Long], Array[Long]) =
      (0L, new Array[Long](d), new Array[Long](tri))
    override def reduce(b: (Long, Array[Long], Array[Long]), q: Array[Long])
        : (Long, Array[Long], Array[Long]) = {
      // callers pre-filter null vectors; this require turns a slipped-through
      // null into a named error instead of an opaque executor NPE
      require(q != null, "CovSums: null embedding vector (filter nulls upstream)")
      require(q.length == d, s"vector length ${q.length} != d=$d")
      var i = 0
      var t = 0
      while (i < d) {
        b._2(i) += q(i)
        var j = i
        while (j < d) { b._3(t) += q(i) * q(j); j += 1; t += 1 }
        i += 1
      }
      (b._1 + 1, b._2, b._3)
    }
    override def merge(a: (Long, Array[Long], Array[Long]), b: (Long, Array[Long], Array[Long]))
        : (Long, Array[Long], Array[Long]) = {
      var i = 0
      while (i < d) { a._2(i) += b._2(i); i += 1 }
      var t = 0
      while (t < tri) { a._3(t) += b._3(t); t += 1 }
      (a._1 + b._1, a._2, a._3)
    }
    override def finish(r: (Long, Array[Long], Array[Long])): (Long, Array[Long], Array[Long]) = r
    override def bufferEncoder: Encoder[(Long, Array[Long], Array[Long])] =
      ExpressionEncoder[(Long, Array[Long], Array[Long])]()
    override def outputEncoder: Encoder[(Long, Array[Long], Array[Long])] =
      ExpressionEncoder[(Long, Array[Long], Array[Long])]()
  }

  /** One row per upper-triangle pair: (i, j, n, s_i, s_j, sp) with every
    * value an exact integer in micro-units — the oracle-checkable surface
    * of the covariance pass (cov derives as (sp − s_i·s_j/n)/n).
    */
  def covarianceSums(df: DataFrame, vecCol: String, dim: Int, scale: Int = 1000): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val fn = udaf(new CovSums(dim), ExpressionEncoder[Array[Long]]())
    // null vectors are dropped, not NPE'd: transform(null) is null, which
    // would dereference inside the executor as an opaque task failure
    val q = df.filter(col(vecCol).isNotNull).select(
      org.apache.spark.sql.graft.VecFns
        .floorScale(col(vecCol).cast("array<double>"), scale).as("q"))
    val row = q.agg(fn(col("q")).as("c"))
      .select(col("c._1").as("n"), col("c._2").as("s"), col("c._3").as("p"))
    val pairs = array((0 until dim).flatMap(i => (i until dim).map(j =>
      struct(lit(i).as("i"), lit(j).as("j")))): _*)
    // upper-triangle offset of (i, j): rows above i hold d, d-1, ... so
    // start(i) = i*d - i(i-1)/2; element_at is 1-based
    val i = col("ij.i")
    val j = col("ij.j")
    val triIdx = i * dim - i * (i - lit(1)) / 2 + (j - i) + 1
    row.select(col("n"), col("s"), col("p"), explode(pairs).as("ij"))
      .select(i.as("i"), j.as("j"), col("n"),
        element_at(col("s"), i + 1).as("s_i"),
        element_at(col("s"), j + 1).as("s_j"),
        element_at(col("p"), triIdx.cast("int")).as("sp"))
  }

  /** Fitted model: per-dim mean (original units) and the top-k principal
    * components (unit length, eigenvalue-descending, sign-normalized so
    * the largest-|coord| entry is positive — a deterministic total choice).
    */
  case class PcaModel(mean: Seq[Double], eigenvalues: Seq[Double],
      components: Seq[Seq[Double]])

  /** Cyclic Jacobi eigendecomposition of a symmetric d×d matrix —
    * deterministic (fixed sweep order, fixed convergence threshold), no
    * library dependency. O(d³) per sweep on the DRIVER over a
    * model-constant d; returns (eigenvalues, eigenvectors as rows).
    */
  private[graft] def jacobiEigen(m: Array[Array[Double]]): (Array[Double], Array[Array[Double]]) = {
    val d = m.length
    val a = m.map(_.clone())
    val v = Array.tabulate(d, d)((i, j) => if (i == j) 1.0 else 0.0)
    var sweep = 0
    var off = Double.MaxValue
    while (sweep < 100 && off > 1e-12) {
      off = 0.0
      for (p <- 0 until d; q <- p + 1 until d) {
        off += a(p)(q) * a(p)(q)
        if (math.abs(a(p)(q)) > 1e-15) {
          val theta = (a(q)(q) - a(p)(p)) / (2.0 * a(p)(q))
          val t = math.signum(theta) / (math.abs(theta) + math.sqrt(theta * theta + 1.0))
          val c = 1.0 / math.sqrt(t * t + 1.0)
          val s = t * c
          for (k <- 0 until d) {
            val akp = a(k)(p); val akq = a(k)(q)
            a(k)(p) = c * akp - s * akq
            a(k)(q) = s * akp + c * akq
          }
          for (k <- 0 until d) {
            val apk = a(p)(k); val aqk = a(q)(k)
            a(p)(k) = c * apk - s * aqk
            a(q)(k) = s * apk + c * aqk
          }
          for (k <- 0 until d) {
            val vkp = v(k)(p); val vkq = v(k)(q)
            v(k)(p) = c * vkp - s * vkq
            v(k)(q) = s * vkp + c * vkq
          }
        }
      }
      sweep += 1
    }
    val eig = (0 until d).map(i => a(i)(i)).toArray
    val vecs = (0 until d).map(c => (0 until d).map(r => v(r)(c)).toArray).toArray
    (eig, vecs)
  }

  /** Deterministic top-k subspace (block power / orthogonal) iteration on a
    * symmetric PSD d×d matrix — the [[MaxEigenDim]] < d ≤ [[MaxCovDim]]
    * eigensolver. O(k·d²) per iterate where Jacobi is O(d³) per sweep, so
    * embedding-width covariances (d=2048/4096) solve in seconds for the
    * handful of components PCA consumers want.
    *
    * Shape: rows of `q` span the current subspace; each iterate multiplies
    * by the matrix, re-orthonormalizes (modified Gram–Schmidt, fixed row
    * order), and converges when Rayleigh-quotient estimates are stationary.
    * A final Rayleigh–Ritz step ([[jacobiEigen]] on the k×k projected
    * matrix — tiny) rotates the converged subspace onto the eigenvectors
    * proper, so closely-spaced eigenvalues resolve correctly instead of
    * stalling the plain power recurrence. Init is a fixed splitmix64 fill —
    * deterministic, and never accidentally orthogonal to an eigenvector the
    * way an identity-basis init can be. Same determinism contract as
    * [[jacobiEigen]]: fixed iteration order, no randomness, no library.
    */
  private[graft] def powerEigen(m: Array[Array[Double]], k: Int, maxIter: Int = 500,
      tol: Double = 1e-12): (Array[Double], Array[Array[Double]]) = {
    val d = m.length
    require(k > 0 && k <= d, s"need 0 < k <= d, got k=$k d=$d")
    def mix(x: Long): Long = {
      var z = x + 0x9E3779B97F4A7C15L
      z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
      z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
      z ^ (z >>> 31)
    }
    val q = Array.tabulate(k, d)((c, i) => mix(c.toLong * d + i).toDouble / Long.MaxValue)
    // modified Gram–Schmidt over rows, in place; a collapsed row (subspace
    // deficiency mid-iteration) is re-seeded deterministically from `salt`
    def orthonormalize(rows: Array[Array[Double]], salt: Long): Unit = {
      var c = 0
      while (c < rows.length) {
        val r = rows(c)
        var p = 0
        while (p < c) {
          val o = rows(p)
          var dot = 0.0
          var i = 0
          while (i < d) { dot += r(i) * o(i); i += 1 }
          i = 0
          while (i < d) { r(i) -= dot * o(i); i += 1 }
          p += 1
        }
        var nrm = 0.0
        var i = 0
        while (i < d) { nrm += r(i) * r(i); i += 1 }
        nrm = math.sqrt(nrm)
        if (nrm < 1e-14) {
          i = 0
          while (i < d) { r(i) = mix(salt + c.toLong * d + i).toDouble / Long.MaxValue; i += 1 }
          orthonormalize(rows, salt + k.toLong * d) // redo from a fresh seed
          return
        }
        i = 0
        while (i < d) { r(i) /= nrm; i += 1 }
        c += 1
      }
    }
    orthonormalize(q, 1L)
    def mul(v: Array[Double]): Array[Double] = {
      val out = new Array[Double](d)
      var i = 0
      while (i < d) {
        val mi = m(i)
        var s = 0.0
        var j = 0
        while (j < d) { s += mi(j) * v(j); j += 1 }
        out(i) = s
        i += 1
      }
      out
    }
    val prev = Array.fill(k)(Double.MaxValue)
    var it = 0
    var converged = false
    while (it < maxIter && !converged) {
      val z = q.map(mul)
      converged = true
      var c = 0
      while (c < k) {
        var ray = 0.0
        var i = 0
        while (i < d) { ray += q(c)(i) * z(c)(i); i += 1 }
        if (math.abs(ray - prev(c)) > tol * math.max(1.0, math.abs(ray))) converged = false
        prev(c) = ray
        System.arraycopy(z(c), 0, q(c), 0, d)
        c += 1
      }
      orthonormalize(q, it.toLong + 2L)
      it += 1
    }
    // Rayleigh–Ritz: project M onto the converged subspace and solve the
    // k×k problem exactly; rotate the basis onto the Ritz vectors
    val mq = q.map(mul)
    val small = Array.tabulate(k, k) { (a, b) =>
      var s = 0.0
      var i = 0
      while (i < d) { s += q(a)(i) * mq(b)(i); i += 1 }
      s
    }
    // symmetrize against round-off before the symmetric solver
    for (a <- 0 until k; b <- a + 1 until k) {
      val avg = (small(a)(b) + small(b)(a)) / 2.0
      small(a)(b) = avg; small(b)(a) = avg
    }
    val (se, sv) = jacobiEigen(small)
    val order = se.indices.sortBy(i => -se(i))
    val eig = order.map(se).toArray
    val vecs = order.map { oi =>
      val w = sv(oi)
      val out = new Array[Double](d)
      var c = 0
      while (c < k) {
        var i = 0
        while (i < d) { out(i) += w(c) * q(c)(i); i += 1 }
        c += 1
      }
      out
    }.toArray
    (eig, vecs)
  }

  /** Fit the top-k components: one covariance-sums pass (see above), then
    * a driver-side eigensolve on the d×d matrix — full Jacobi to
    * [[MaxEigenDim]], top-k subspace iteration ([[powerEigen]]) beyond it
    * up to [[MaxCovDim]].
    */
  def fit(df: DataFrame, vecCol: String, dim: Int, k: Int, scale: Int = 1000): PcaModel = {
    require(k > 0 && k <= dim, s"need 0 < k <= dim, got k=$k dim=$dim")
    require(dim <= MaxCovDim,
      s"dim=$dim exceeds MaxCovDim=$MaxCovDim — reduce the dimension upstream " +
        "(pool/truncate) or use a blocked/sketched covariance")
    require(dim <= MaxEigenDim || k <= MaxPowerK,
      s"k=$k exceeds MaxPowerK=$MaxPowerK for the d > $MaxEigenDim subspace solver — " +
        "hundreds of components at this width call for randomized SVD, not PCA fit")
    val spark = df.sparkSession
    import spark.implicits._
    val fn = udaf(new CovSums(dim), ExpressionEncoder[Array[Long]]())
    val q = df.filter(col(vecCol).isNotNull).select(
      org.apache.spark.sql.graft.VecFns
        .floorScale(col(vecCol).cast("array<double>"), scale).as("q"))
    val (n, s, p) = q.agg(fn(col("q")).as("c"))
      .select(col("c._1"), col("c._2"), col("c._3"))
      .as[(Long, Array[Long], Array[Long])].collect()(0)
    // degenerate corpus (empty ingest / filter matched nothing): covariance
    // is undefined, so return the EMPTY model — projection against it is an
    // empty result with the right schema, the same contract as the empty
    // [[Ivf]] index, not an analysis error
    if (n <= 1) return PcaModel(Seq.fill(dim)(0.0), Seq.empty, Seq.empty)
    // covariance back in ORIGINAL units: micro sums divide by scale (per
    // factor); cov(i,j) = (sp/n − (s_i/n)(s_j/n)) / scale²
    val mean = s.map(_.toDouble / n / scale)
    val cov = Array.tabulate(dim, dim) { (i, j) =>
      val (lo, hi) = if (i <= j) (i, j) else (j, i)
      val t = lo * dim - lo * (lo - 1) / 2 + (hi - lo)
      (p(t).toDouble / n - (s(lo).toDouble / n) * (s(hi).toDouble / n)) / (scale.toDouble * scale)
    }
    val (eig, vecs) =
      if (dim <= MaxEigenDim) jacobiEigen(cov) else powerEigen(cov, k)
    val top = eig.zip(vecs).sortBy { case (e, _) => -e }.take(k).map { case (e, vec) =>
      // sign convention: the largest-|coord| entry positive (first on ties)
      val pivot = vec.indices.maxBy(i => (math.abs(vec(i)), -i))
      (e, if (vec(pivot) < 0) vec.map(-_) else vec)
    }
    PcaModel(mean.toSeq, top.map(_._1).toSeq, top.map(_._2.toSeq).toSeq)
  }

  /** Persist mean + components as parquet (same externalized-model contract
    * as [[Ivf.save]] — the oracle replays the projection from these files).
    *
    * ATOMIC (r19, [[ModelStore.publish]]): a projection against a new
    * mean with old components (or vice versa) is silently wrong — the
    * two tables stage together and commit with one directory rename to
    * `current/`; concurrent publishers refuse loudly and [[load]]
    * retries around a racing commit.
    */
  def save(model: PcaModel, spark: SparkSession, path: String): Unit =
    ModelStore.publish(spark, path, "PCA model",
        legacyNames = Seq("mean", "components")) { staging =>
      import spark.implicits._
      Seq(Tuple1(model.mean)).toDF("mean")
        .repartition(1).write.parquet(s"$staging/mean")
      model.components.zipWithIndex.map { case (c, i) => (i, model.eigenvalues(i), c) }
        .toDF("comp_id", "eigenvalue", "vec")
        .repartition(1).write.parquet(s"$staging/components")
    }

  def load(spark: SparkSession, path: String): PcaModel =
    ModelStore.read(spark, path, "PCA model",
        isLegacy = ns => ns.contains("mean") && ns.contains("components")) { cur =>
      val mean = spark.read.parquet(s"$cur/mean").collect()(0).getSeq[Double](0)
      val comps = spark.read.parquet(s"$cur/components")
        .collect().map(r => (r.getInt(0), r.getDouble(1), r.getSeq[Double](2)))
        .sortBy(_._1)
      PcaModel(mean, comps.map(_._2).toSeq, comps.map(_._3).toSeq)
    }

  /** Project every vector onto the model's components: one row per
    * (id, comp_id) with proj = (x − mean)·v_c, floor6-stabilized. The
    * centered vector is computed once per row; components ride a broadcast
    * k-row join; the dot is the codegen'd native expression.
    */
  def project(df: DataFrame, idCol: String, vecCol: String, model: PcaModel): DataFrame = {
    // r21: per-row array of native centered dots + posexplode, instead of
    // a broadcast crossJoin against a k-row component frame and an
    // interpreted zip_with centering — no join at all, and the (x − mean)
    // subtraction fuses into each dot (same IEEE sequence; PcaSpec pins
    // kernel ≡ reference). comp_id = position, exactly the old join key.
    // Empty model (fit on an empty corpus) → empty result with the right
    // schema, the same contract as the old empty broadcast join.
    if (model.components.isEmpty)
      return df.select(col(idCol), lit(0).as("comp_id"), lit(0.0).as("proj"))
        .filter(lit(false))
    val pcols = model.components.map { c =>
      floor6(org.apache.spark.sql.graft.CenteredDot
        .centeredDot(col("__x"), model.mean, c))
    }
    df.select(col(idCol), col(vecCol).cast("array<double>").as("__x"))
      .select(col(idCol), posexplode(array(pcols: _*)).as(Seq("comp_id", "proj")))
  }

  /** REFERENCE FORM of [[project]]'s kernel shape (spec-pinned). */
  private[graft] def projectRef(df: DataFrame, idCol: String, vecCol: String,
      model: PcaModel): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val meanLit: Column = array(model.mean.map(lit): _*)
    val comps = model.components.zipWithIndex
      .map { case (c, i) => (i, c) }.toDF("comp_id", "cvec")
    df.select(col(idCol),
        zip_with(col(vecCol).cast("array<double>"), meanLit, (x, m) => x - m).as("xc"))
      .crossJoin(broadcast(comps))
      .select(col(idCol), col("comp_id"),
        floor6(graft.functions.Native.dot(col("xc"), col("cvec"))).as("proj"))
  }

  /** Whitened projection: each component's coordinate scaled to unit
    * variance — (x − mean)·v_c / √λ_c, the transform SemDeDup-style
    * pipelines feed to cosine similarity so no single direction dominates.
    * Components with λ ≤ ε (numerically dead directions) emit NULL rather
    * than an amplified-noise coordinate. Same broadcast shape as
    * [[project]]; same floor6/persisted-doubles determinism contract.
    */
  def whiten(df: DataFrame, idCol: String, vecCol: String, model: PcaModel,
      eps: Double = 1e-12): DataFrame = {
    // same kernel shape as [[project]] (PcaSpec pins ≡ [[whitenRef]]);
    // dead components (λ ≤ eps) keep their NULL coordinate row
    if (model.components.isEmpty)
      return df.select(col(idCol), lit(0).as("comp_id"), lit(0.0).as("white"))
        .filter(lit(false))
    val wcols = model.components.zipWithIndex.map { case (c, i) =>
      if (model.eigenvalues(i) > eps)
        floor6(org.apache.spark.sql.graft.CenteredDot
          .centeredDot(col("__x"), model.mean, c) / math.sqrt(model.eigenvalues(i)))
      else lit(null).cast("double")
    }
    df.select(col(idCol), col(vecCol).cast("array<double>").as("__x"))
      .select(col(idCol), posexplode(array(wcols: _*)).as(Seq("comp_id", "white")))
  }

  /** REFERENCE FORM of [[whiten]]'s kernel shape (spec-pinned). */
  private[graft] def whitenRef(df: DataFrame, idCol: String, vecCol: String,
      model: PcaModel, eps: Double = 1e-12): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val meanLit: Column = array(model.mean.map(lit): _*)
    val comps = model.components.zipWithIndex
      .map { case (c, i) => (i, model.eigenvalues(i), c) }
      .toDF("comp_id", "eigenvalue", "cvec")
    df.select(col(idCol),
        zip_with(col(vecCol).cast("array<double>"), meanLit, (x, m) => x - m).as("xc"))
      .crossJoin(broadcast(comps))
      .select(col(idCol), col("comp_id"),
        floor6(when(col("eigenvalue") > eps,
          graft.functions.Native.dot(col("xc"), col("cvec")) / sqrt(col("eigenvalue")))
        ).as("white"))
  }

  /** Per-row projected VECTOR — the pipeline/STREAMING form of [[project]]:
    * one `array<double>` column with the k component coordinates in
    * comp_id order, computed against literal component arrays — no join at
    * all, so it applies identically to a batch frame and a streaming one
    * (stream-static cross joins are not supported; plan literals are).
    * Coordinate c equals [[project]]'s `proj` for `comp_id = c` exactly
    * (same centering, same codegen'd dot, same floor6) — `PcaStreamSpec`
    * pins batch ≡ stream ≡ exploded-project agreement.
    */
  def projectVector(df: DataFrame, idCol: String, vecCol: String, model: PcaModel): DataFrame = {
    // empty model (fit on an empty corpus) → empty result with the right
    // schema, the same contract as [[project]]'s empty broadcast join.
    // filter(false), NOT limit(0): limit is unsupported on streaming
    // Datasets, and this form must honor the batch ≡ stream contract
    if (model.components.isEmpty)
      return df.select(col(idCol), array().cast("array<double>").as("pvec"))
        .filter(lit(false))
    // r21: fused native centered dots (see [[project]]); PcaStreamSpec's
    // batch ≡ stream ≡ exploded-project agreement pins the values
    val pcols = model.components.map { c =>
      floor6(org.apache.spark.sql.graft.CenteredDot
        .centeredDot(col("__x"), model.mean, c))
    }
    df.select(col(idCol), col(vecCol).cast("array<double>").as("__x"))
      .select(col(idCol), array(pcols: _*).as("pvec"))
  }

  /** Per-row whitened VECTOR — the pipeline form of [[whiten]] (which
    * explodes to oracle-checkable (id, comp_id, white) rows): one
    * `array<double>` column holding the live components' whitened
    * coordinates in comp_id order, computed in a single per-row projection
    * against literal component arrays — NO join, NO shuffle, the shape a
    * whiten → cluster → dedup pipeline wants between stages. Dead
    * directions (λ ≤ eps) are DROPPED rather than emitted as NULL:
    * downstream consumers (k-means, cosine) need dense numeric vectors.
    * Coordinates carry the same floor6/persisted-doubles determinism
    * contract as [[whiten]], so the two forms agree value-for-value.
    */
  def whitenVector(df: DataFrame, idCol: String, vecCol: String, model: PcaModel,
      eps: Double = 1e-12): DataFrame = {
    // empty model (fit on an empty corpus) → empty result, as above
    // (streaming-safe filter(false), not limit(0)); a NON-empty model whose
    // components are ALL dead is a data pathology (degenerate corpus) and
    // still fails loudly below
    if (model.components.isEmpty)
      return df.select(col(idCol), array().cast("array<double>").as("wvec"))
        .filter(lit(false))
    val live = model.components.zipWithIndex
      .filter { case (_, i) => model.eigenvalues(i) > eps }
    require(live.nonEmpty,
      "whitenVector: every component is numerically dead (all eigenvalues <= eps)")
    // r21: fused native centered dots (see [[project]])
    val wcols = live.map { case (c, i) =>
      floor6(org.apache.spark.sql.graft.CenteredDot
        .centeredDot(col("__x"), model.mean, c) / math.sqrt(model.eigenvalues(i)))
    }
    df.select(col(idCol), col(vecCol).cast("array<double>").as("__x"))
      .select(col(idCol), array(wcols: _*).as("wvec"))
  }
}
