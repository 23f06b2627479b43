package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic distributed k-means (Lloyd's algorithm) over an embedding
  * column — the clustering step of corpus curation (topic balancing,
  * cluster-based dedup/filtering à la SemDeDup, IVF list building).
  *
  * Everything runs in QUANTIZED INTEGER space: coordinates are floored to
  * `scale` micro-units (millis by default), distances are exact integer
  * sums of squares, and updated centroids are floored integer divisions of
  * exact integer sums. There is no floating-point accumulation anywhere, so
  * results do not depend on partitioning or aggregation order — the same
  * property that makes the DuckDB oracle able to reproduce every assignment
  * bit-for-bit (cross-engine double summation of float coords would
  * tie-break argmins differently once in a blue moon; integer math never
  * does).
  *
  * Scale shape per round:
  *  - assignment: centroids (k rows, bounded) are collapsed to ONE row and
  *    broadcast; each vector computes its argmin in a per-row array
  *    expression — no shuffle at all.
  *  - update: assigned vectors posexplode to (cluster, dim, val) and
  *    groupBy(cluster, dim) sums with map-side combine — one shuffle of
  *    k·d longs per partition, independent of corpus size.
  *  - empty clusters keep their previous centroid (left join + coalesce),
  *    so k never silently shrinks.
  *
  * Overflow headroom: |q| ≤ scale·max|x|; with unit-ish embeddings and
  * scale=1000, per-dim diff² ≤ ~2^24 and the d-dim sum ≤ ~2^31 — long
  * arithmetic has ~32 bits to spare. Sums for centroid updates hold to
  * ~2^52 rows per cluster.
  */
object KMeans {

  /** (idCol, q: array<long>) — coordinates floored to integer micro-units.
    * Cast to double BEFORE scaling: float→double promotion is exact, so
    * both engines floor the same double product. r21: native
    * [[org.apache.spark.sql.graft.FloorScale]] kernel (the column
    * `transform` was an interpreted lambda per element); same doubles,
    * same floors — KMeansSpec pins it.
    */
  def quantize(df: DataFrame, vecCol: String, idCol: String, scale: Int = 1000): DataFrame =
    df.select(col(idCol),
      org.apache.spark.sql.graft.VecFns
        .floorScale(col(vecCol).cast("array<double>"), scale).as("q"))

  /** REFERENCE FORM of [[quantize]]'s kernel (spec-pinned). */
  private[graft] def quantizeRef(df: DataFrame, vecCol: String, idCol: String,
      scale: Int = 1000): DataFrame =
    df.select(col(idCol),
      transform(col(vecCol), x => floor(x.cast("double") * scale).cast("long")).as("q"))

  /** Integer squared L2 distance between two equal-length long arrays —
    * native kernel ([[org.apache.spark.sql.graft.Dist2L]]; r21). This is
    * the hottest expression in the fit (once per row per centroid per
    * round, and it runs INSIDE the `transform` lambda of [[assign]] where
    * the old `aggregate(zip_with(...))` composition paid two interpreted
    * lambdas and a zipped-array allocation per centroid). `KMeansSpec`
    * pins kernel ≡ composition, including null/length-mismatch edges.
    */
  private def dist2(a: Column, b: Column): Column =
    org.apache.spark.sql.graft.Dist2L.dist2l(a, b)

  /** REFERENCE FORM of [[dist2]] (spec-pinned builtin composition). */
  private[graft] def dist2Ref(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)), lit(0L), (acc, v) => acc + v)

  private[graft] def dist2Kernel(a: Column, b: Column): Column =
    org.apache.spark.sql.graft.Dist2L.dist2l(a, b)

  /** Initial centroids: the quantized vectors of the k smallest ids,
    * cluster index = id rank. The k-row sort/window is bounded by k, not
    * the corpus (limit pushes down to a TakeOrdered).
    */
  private def initCentroids(q: DataFrame, idCol: String, k: Int): DataFrame =
    q.orderBy(col(idCol)).limit(k)
      .withColumn("c", row_number().over(Window.orderBy(col(idCol))).cast("long") - 1)
      .select(col("c"), col("q").as("cent"))

  /** Centroids (c, cent) → one broadcastable row: array of (c, cent)
    * structs sorted by c (array_sort on struct = lexicographic, and c is
    * unique). Bounded by k.
    */
  private def centroidsRow(cents: DataFrame): DataFrame =
    cents.groupBy().agg(
      array_sort(collect_list(struct(col("c"), col("cent")))).as("cs"))

  /** Assign each vector to the nearest centroid, ties to the smallest
    * cluster id: array_min over (dist², c) structs — lexicographic struct
    * ordering IS the argmin-with-tiebreak. Pure per-row work against the
    * broadcast centroid row.
    */
  private def assign(q: DataFrame, cents: DataFrame, idCol: String): DataFrame = {
    val best = array_min(transform(col("cs"),
      c => struct(dist2(col("q"), c.getField("cent")).as("d2"),
        c.getField("c").as("c"))))
    q.crossJoin(broadcast(centroidsRow(cents)))
      .select(col(idCol), col("q"), best.getField("c").as("cluster"),
        best.getField("d2").as("d2"))
  }

  /** Per-cluster element-wise vector sums + per-dim contributing-row
    * counts — ONE mergeable buffer of (d longs, d longs) per cluster per
    * partition, the r21 replacement for the posexplode shuffle in
    * [[update]]: the exploded form generated n·d rows into the partial
    * aggregation (64× row inflation at embedding width) and needed a
    * SECOND shuffle to reassemble the centroid arrays; this folds both
    * into one groupBy. Shuffled bytes drop from ~3 rows-worth of overhead
    * per (cluster, dim) to two packed long arrays per cluster per map
    * partition. Null ELEMENTS add 0 to the sum and still count the row —
    * exactly the exploded form's `sum(v)` (null-skipping) over
    * `count(lit(1))` (row-counting) per dim; rows with NULL or empty q are
    * filtered by the caller, matching posexplode's emit-nothing behavior.
    */
  private class VecSum extends org.apache.spark.sql.expressions.Aggregator[
      Array[java.lang.Long], (Array[Long], Array[Long]), (Seq[Long], Seq[Long])] {
    import org.apache.spark.sql.Encoder
    import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
    private def grow(a: Array[Long], n: Int): Array[Long] =
      if (a.length >= n) a else java.util.Arrays.copyOf(a, n)
    override def zero: (Array[Long], Array[Long]) =
      (Array.empty[Long], Array.empty[Long])
    // DOCUMENTED edge divergence (ADVICE r21): a dimension whose values
    // are null in EVERY member of a cluster sums to 0 here, where the
    // exploded reference's sum(v) yields NULL for that (cluster, dim) —
    // reachable only if every vector in a cluster holds a null at the
    // same position (no table stores null vector elements; the
    // quantizeInt8Ref discipline: divergence documented, not padded)
    override def reduce(b: (Array[Long], Array[Long]), q: Array[java.lang.Long])
        : (Array[Long], Array[Long]) = {
      val s = grow(b._1, q.length)
      val n = grow(b._2, q.length)
      var i = 0
      while (i < q.length) {
        if (q(i) != null) s(i) += q(i)
        n(i) += 1
        i += 1
      }
      (s, n)
    }
    override def merge(a: (Array[Long], Array[Long]), b: (Array[Long], Array[Long]))
        : (Array[Long], Array[Long]) = {
      val s = grow(a._1, b._1.length)
      val n = grow(a._2, b._2.length)
      var i = 0
      while (i < b._1.length) { s(i) += b._1(i); n(i) += b._2(i); i += 1 }
      (s, n)
    }
    override def finish(r: (Array[Long], Array[Long])): (Seq[Long], Seq[Long]) =
      (r._1.toSeq, r._2.toSeq)
    override def bufferEncoder: Encoder[(Array[Long], Array[Long])] =
      ExpressionEncoder[(Array[Long], Array[Long])]()
    override def outputEncoder: Encoder[(Seq[Long], Seq[Long])] =
      ExpressionEncoder[(Seq[Long], Seq[Long])]()
  }

  /** One Lloyd update: per-(cluster, dim) integer sums → floored integer
    * division → re-assembled centroid arrays; empty clusters inherit the
    * previous centroid. One shuffle of two d-long arrays per cluster per
    * map partition ([[VecSum]]); [[updateRef]] is the spec-pinned
    * exploded twin this replaced (2 Exchanges and n·d generated rows per
    * round → 1 Exchange, no Generate).
    */
  private def update(assigned: DataFrame, prev: DataFrame): DataFrame = {
    val fn = udaf(new VecSum,
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[java.lang.Long]]())
    // posexplode emitted nothing for NULL/empty q — filter to match, so a
    // cluster whose every row is degenerate still inherits prev_cent
    val rebuilt = assigned
      .filter(col("q").isNotNull && size(col("q")) > 0)
      .groupBy("cluster").agg(fn(col("q")).as("sn"))
      .select(col("cluster").as("c"),
        zip_with(col("sn._1"), col("sn._2"), (s, n) =>
          floor(s.cast("double") / n.cast("double")).cast("long")).as("cent"))
    prev.select(col("c"), col("cent").as("prev_cent"))
      .join(rebuilt, Seq("c"), "left")
      .select(col("c"), coalesce(col("cent"), col("prev_cent")).as("cent"))
  }

  /** REFERENCE FORM of [[update]] (spec-pinned exploded twin). */
  private[graft] def updateRef(assigned: DataFrame, prev: DataFrame): DataFrame = {
    val sums = assigned
      .select(col("cluster"), posexplode(col("q")).as(Seq("dim", "v")))
      .groupBy("cluster", "dim")
      .agg(sum("v").as("s"), count(lit(1)).as("n"))
      .select(col("cluster"),  col("dim"),
        floor(col("s").cast("double") / col("n").cast("double")).cast("long").as("cv"))
    val rebuilt = sums.groupBy("cluster")
      .agg(transform(array_sort(collect_list(struct(col("dim"), col("cv")))),
        x => x.getField("cv")).as("cent"))
      .withColumnRenamed("cluster", "c")
    prev.select(col("c"), col("cent").as("prev_cent"))
      .join(rebuilt, Seq("c"), "left")
      .select(col("c"), coalesce(col("cent"), col("prev_cent")).as("cent"))
  }

  /** [[update]] wired for the spec (private otherwise). */
  private[graft] def updateKernel(assigned: DataFrame, prev: DataFrame): DataFrame =
    update(assigned, prev)

  /** Lineage discipline for the Lloyd loop: the centroid frame (k rows —
    * tiny) accretes one assign+update plan layer per round, so past
    * `checkpointInterval` rounds it is truncated with an eager
    * `localCheckpoint` — plan depth (and Catalyst re-analysis cost) stays
    * constant in `rounds`, same discipline as
    * [[Graph.connectedComponents]]. At the default 2 rounds nothing
    * triggers and the whole fit stays lazy.
    */
  private def lloyd(q: DataFrame, idCol: String, k: Int, rounds: Int,
      checkpointInterval: Int): DataFrame = {
    // validated here, not only in fitAssign: fitCentroids reaches lloyd too,
    // and `r % 0` would otherwise surface as a raw ArithmeticException
    require(checkpointInterval > 0, s"bad checkpointInterval $checkpointInterval")
    var cents = initCentroids(q, idCol, k)
    // superseded-checkpoint release, same discipline as
    // [[Graph.pageRankInt]]: k rows is tiny, but a long fit must not
    // accumulate one pinned block set per interval boundary
    var pinned: Option[DataFrame] = None
    for (r <- 1 to rounds) {
      cents = update(assign(q, cents, idCol), cents)
      if (r % checkpointInterval == 0 && r < rounds) {
        cents = cents.localCheckpoint(true)
        pinned.foreach(Lineage.release)
        pinned = Some(cents)
      }
    }
    cents
  }

  /** `rounds` Lloyd iterations from the deterministic init, then a final
    * assignment: (idCol, cluster, d2) with d2 the exact integer squared
    * distance in micro-units².
    */
  def fitAssign(df: DataFrame, vecCol: String, idCol: String, k: Int = 8,
      rounds: Int = 2, scale: Int = 1000, checkpointInterval: Int = 10): DataFrame = {
    require(k > 0 && rounds >= 0 && scale > 0, s"bad k=$k rounds=$rounds scale=$scale")
    require(checkpointInterval > 0, s"bad checkpointInterval $checkpointInterval")
    // materialize the quantized corpus ONCE (same persist discipline as
    // [[Graph.pageRankInt]]'s static tables): lloyd's init + every round's
    // assignment + the final assignment below would otherwise re-scan the
    // source and re-run the per-row quantize transform rounds+2 times —
    // at 100 TB the repeated scan IS the cost, and the checkpointed form
    // is the 2-column projection, not the full row. OWNERSHIP: the
    // returned (lazy) assignment reads these blocks, so they cannot be
    // released here — they live until the result frame is GC'd
    // (ContextCleaner). A long-lived driver fitting in a loop should
    // consume each result promptly and drop the reference; the per-fit
    // footprint is the 2-column projection, never the full corpus row.
    val q = quantize(df, vecCol, idCol, scale).localCheckpoint(true)
    val cents = lloyd(q, idCol, k, rounds, checkpointInterval)
    assign(q, cents, idCol).select(col(idCol), col("cluster"), col("d2"))
  }

  /** The trained centroids themselves (c, cent in micro-units) after
    * `rounds` iterations — for handoff to IVF list building or audit.
    */
  def fitCentroids(df: DataFrame, vecCol: String, idCol: String, k: Int = 8,
      rounds: Int = 2, scale: Int = 1000, checkpointInterval: Int = 10): DataFrame = {
    require(k > 0 && rounds >= 0 && scale > 0, s"bad k=$k rounds=$rounds scale=$scale")
    // rounds+1 corpus passes (init + one assignment per round) share one
    // materialization; at rounds=0 only init reads q, so stay lazy
    val q0 = quantize(df, vecCol, idCol, scale)
    val q = if (rounds >= 1) q0.localCheckpoint(true) else q0
    lloyd(q, idCol, k, rounds, checkpointInterval)
  }
}
