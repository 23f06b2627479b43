package graft.ops

import org.apache.spark.ml.clustering.KMeans
import org.apache.spark.ml.functions.array_to_vector
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** IVF (inverted-file) approximate nearest neighbor over an embedding
  * column — the coarse-quantizer alternative to [[Similarity]]'s LSH path:
  * k-means partitions the corpus into `nlist` lists; a query scans only its
  * `nprobe` closest lists.
  *
  * Scale shape: training samples the corpus (k-means on a bounded sample is
  * standard IVF practice); assignment is one broadcast-centroid projection
  * per row; the probe search is an equi-join on list id, so scanned
  * candidates ≈ corpus × nprobe / nlist. All per-row math uses the native
  * codegen'd [[graft.functions.Native.dot]].
  */
object Ivf {

  case class IvfIndex(centroids: Seq[Seq[Double]], assignments: DataFrame)

  private def asDouble(c: Column): Column = c.cast("array<double>")

  /** Centroid-ranking score: squared L2 minus the per-query constant
    * |v|² (constant across centroids, so it cancels out of the argmin —
    * computing dot(v,v) once per centroid would be pure wasted work on
    * the probe-ranking hot path).
    */
  private def centroidDist(v: Column, c: Seq[Double]): Column = {
    val lit_c = array(c.map(lit): _*)
    lit(c.map(x => x * x).sum) - lit(2.0) * Similarity.dot(v, lit_c)
  }

  /** Train the coarse quantizer and assign every vector to its list.
    * `trainFraction` bounds the k-means input at scale.
    */
  def build(df: DataFrame, idCol: String, vecCol: String, nlist: Int,
      seed: Long = 42L, trainFraction: Double = 1.0): IvfIndex = {
    val feat = df.select(col(idCol), asDouble(col(vecCol)).as("v"))
      .withColumn("features", array_to_vector(col("v")))
    val sample = if (trainFraction >= 1.0) feat else feat.sample(trainFraction, seed)
    // empty corpus (a fresh ingest, a filter that matched nothing): MLlib
    // k-means requires ≥1 row, so short-circuit to an empty index — search
    // over it yields no candidates, which is the right answer
    if (sample.isEmpty) return IvfIndex(Seq.empty,
      feat.select(col(idCol), col("v"), lit(0).as("list_id")).limit(0))
    val model = new KMeans().setK(nlist).setSeed(seed).setFeaturesCol("features").fit(sample)
    val centroids = model.clusterCenters.map(_.toArray.toSeq).toSeq
    val assigned = model.transform(feat)
      .select(col(idCol), col("v"), col("prediction").as("list_id"))
    IvfIndex(centroids, assigned)
  }

  /** Persist the index: assignments as parquet (distributed, partitioned by
    * nothing — readers equi-join on list_id), centroids as a tiny parquet
    * side table. Build once, search many — the production ANN lifecycle.
    *
    * ATOMIC (r19, [[ModelStore.publish]]): assignments reference centroid
    * ids from THIS k-means run — a crash between two in-place overwrites
    * used to leave new assignments against old centroids, a silently
    * mis-ranked index no row-level check catches. Both tables stage
    * under one temp dir and commit with a single directory rename to
    * `current/`; concurrent publishers refuse loudly (single-publisher
    * claim) and readers retry around a racing commit.
    */
  def save(index: IvfIndex, spark: org.apache.spark.sql.SparkSession, path: String): Unit =
    ModelStore.publish(spark, path, "IVF index",
        legacyNames = Seq("assignments", "centroids")) { staging =>
      index.assignments.write.parquet(s"$staging/assignments")
      import spark.implicits._
      // c2 = Σcᵢ² precomputed driver-side: probe ranking needs it per
      // (query, centroid), and persisting the exact double lets external
      // readers (the DuckDB oracle) rank probes bit-identically instead of
      // re-summing in their own order
      index.centroids.zipWithIndex.map { case (c, i) => (i, c, c.map(x => x * x).sum) }
        .toDF("list_id", "centroid", "c2")
        .repartition(1).write.parquet(s"$staging/centroids")
    }

  def load(spark: org.apache.spark.sql.SparkSession, path: String): IvfIndex =
    ModelStore.read(spark, path, "IVF index",
        isLegacy = ns => ns.contains("assignments") && ns.contains("centroids")) { cur =>
      val centroids = spark.read.parquet(s"$cur/centroids")
        .collect().map(r => r.getInt(0) -> r.getSeq[Double](1))
        .sortBy(_._1).map(_._2.toSeq).toSeq
      // the assignments frame stays LAZY (corpus-sized), so it is bound
      // to the load-time FILES, not the directory: a republish after this
      // load replaces current/ and an explicit-path read then fails
      // LOUDLY (FileNotFound) instead of silently pairing the new
      // assignments with these collected centroids
      val aDir = s"$cur/assignments"
      val fs = new org.apache.hadoop.fs.Path(aDir)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      val files = fs.listStatus(new org.apache.hadoop.fs.Path(aDir))
        .filter(f => f.isFile && f.getLen > 0 && {
          val n = f.getPath.getName
          !n.startsWith("_") && !n.startsWith(".")
        }).map(_.getPath.toString).toIndexedSeq
      IvfIndex(centroids,
        if (files.isEmpty) spark.read.parquet(aDir) // footerless edge: dir read
        else spark.read.option("basePath", aDir).parquet(files: _*))
    }

  /** Assign NEW vectors to the EXISTING coarse quantizer — no retrain:
    * per-row argmin over the broadcast centroid literals (the same
    * cancelled-|v|² distance as probe ranking; ties break to the lower
    * list_id via the stable sort over the ascending construction order).
    * This is the index-maintenance half of the production IVF lifecycle:
    * a 100 TB index absorbs a day's ingest with one narrow projection
    * instead of a full rebuild. Returns (idCol, v, list_id) rows in the
    * assignments schema.
    */
  def assignToIndex(index: IvfIndex, df: DataFrame, idCol: String,
      vecCol: String): DataFrame = {
    require(index.centroids.nonEmpty, "cannot assign into an empty index — build first")
    val listDists = index.centroids.zipWithIndex.map { case (c, i) =>
      struct(lit(i).as("list_id"), centroidDist(col("v"), c).as("dist"))
    }
    df.select(col(idCol), asDouble(col(vecCol)).as("v"))
      .withColumn("list_id",
        element_at(array_sort(array(listDists: _*), (a, b) =>
          when(a.getField("dist") < b.getField("dist"), -1)
            .when(a.getField("dist") > b.getField("dist"), 1).otherwise(0)),
          1).getField("list_id"))
  }

  /** Append new vectors to a PERSISTED index (add files to
    * `current/assignments`; centroids untouched). Readers see the new
    * rows on their next load — the lifecycle is build → save → append* →
    * (listStats says rebuild) → build. Unlike [[save]] this is an
    * ADD-FILES mutation of the committed copy, not a republish: parquet's
    * output committer makes each appended file appear whole (never torn
    * rows), but a load racing the append may see a PREFIX of the new
    * files — the pre-append rows are always all there, which is the
    * committed-prefix semantics the incremental indexes serve. A [[save]]
    * supersedes all appends atomically.
    *
    * GUARDED against a concurrent save (r20): a direct `mode("append")`
    * into `current/` racing a publish could land its files in the
    * moved-aside copy (deleted post-commit — silent row loss) or, worse,
    * into the NEW current — rows assigned against the SUPERSEDED
    * centroids mixed into a rebuilt index, silently mis-listed. The new
    * assignments are therefore STAGED outside `current/`, the publish
    * generation is re-checked against its pre-load read, and only then
    * are the files renamed in (metadata-only; a publish completing
    * inside that final rename loop is the same accepted residual as
    * [[ModelStore.publish]]'s re-check→rename gap). On movement the
    * staging is discarded and the append refuses LOUDLY — nothing was
    * adopted; re-run against the new index.
    */
  def append(spark: org.apache.spark.sql.SparkSession, path: String,
      df: DataFrame, idCol: String, vecCol: String): Unit =
    append(spark, path, df, idCol, vecCol, () => ())

  /** [[append]] with a forged-race seam (`beforeRecheck` runs after the
    * staging write, before the generation re-check) — specs only.
    */
  private[graft] def append(spark: org.apache.spark.sql.SparkSession,
      path: String, df: DataFrame, idCol: String, vecCol: String,
      beforeRecheck: () => Unit): Unit = {
    val gen0 = ModelStore.generation(spark, path)
    val index = load(spark, path) // refuses a legacy/crashed layout loudly
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val nonce = java.util.UUID.randomUUID().toString.take(8)
    // NOT ModelStore.StagingPrefix: a concurrent publish heals (deletes)
    // those; this staging is the append's own, adopted or discarded here
    val stage = new org.apache.hadoop.fs.Path(s"$path/_graft_appendstage_$nonce")
    try {
      assignToIndex(index, df, idCol, vecCol).write.parquet(stage.toString)
      beforeRecheck()
      if (ModelStore.generation(spark, path) != gen0)
        throw new java.util.ConcurrentModificationException(
          s"an IVF publish at $path raced this append — the staged rows " +
            "were assigned against the superseded centroids and were " +
            "DISCARDED (nothing adopted); re-run append against the new index")
      val dest = new org.apache.hadoop.fs.Path(
        s"$path/${ModelStore.CurrentDir}/assignments")
      fs.listStatus(stage)
        .filter(st => st.isFile && st.getLen > 0 && {
          val n = st.getPath.getName
          !n.startsWith("_") && !n.startsWith(".")
        })
        .foreach { st =>
          // parquet part names carry a UUID — no collision with the
          // committed files or other appends
          if (!fs.rename(st.getPath, new org.apache.hadoop.fs.Path(dest,
              st.getPath.getName)))
            throw new java.io.IOException(
              s"could not adopt appended file ${st.getPath} into $dest — " +
                "a publish may have raced the adoption; re-run append")
        }
    } finally fs.delete(stage, true)
  }

  /** Per-list occupancy audit — the REBUILD signal: append-only
    * maintenance slowly un-balances lists as the data distribution drifts
    * from the trained quantizer, and an oversized list degrades every
    * query probing it (scanned candidates ≈ Σ probed-list sizes). One
    * count reduce; compare max_over_mean across snapshots and rebuild
    * past a threshold (≈4-8× is the common IVF practice).
    */
  def listStats(index: IvfIndex): DataFrame = {
    val counts = index.assignments.groupBy("list_id")
      .agg(count(lit(1)).as("n_vectors"))
    counts.agg(
      count(lit(1)).as("n_lists"),
      sum(col("n_vectors")).as("n_total"),
      min(col("n_vectors")).as("min_list"),
      max(col("n_vectors")).as("max_list"),
      (max(col("n_vectors")).cast("double") /
        (sum(col("n_vectors")).cast("double") / count(lit(1)).cast("double")))
        .as("max_over_mean"))
  }

  /** Top-k cosine neighbors per query, scanning only the `nprobe` lists
    * whose centroids are closest to the query vector.
    */
  def search(index: IvfIndex, queries: DataFrame, idCol: String, vecCol: String,
      k: Int = 5, nprobe: Int = 4): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"), asDouble(col(vecCol)).as("qv"))
    // empty index (built from an empty corpus): no lists to probe — an
    // empty result with the search schema, not an analysis error.
    // filter(false), NOT limit(0): limit is unsupported on streaming
    // Datasets, and search applies to a streaming query frame too
    // (IvfStreamSpec pins stream ≡ batch)
    if (index.centroids.isEmpty)
      return q.select(col("query_id"), col("query_id").as("neighbor_id"),
        lit(1).as("rnk"), lit(0.0).as("sim")).filter(lit(false))
    // rank lists per query by centroid distance, keep nprobe
    val listDists = index.centroids.zipWithIndex.map { case (c, i) =>
      struct(lit(i).as("list_id"), centroidDist(col("qv"), c).as("dist"))
    }
    val probed = q.select(col("query_id"), col("qv"),
      explode(slice(array_sort(array(listDists: _*), (a, b) =>
        when(a.getField("dist") < b.getField("dist"), -1)
          .when(a.getField("dist") > b.getField("dist"), 1).otherwise(0)),
        1, nprobe)).as("probe"))
      .select(col("query_id"), col("qv"), col("probe.list_id").as("list_id"))
    // candidate generation = equi-join on list id (never full corpus)
    val cand = probed.join(index.assignments.withColumnRenamed("list_id", "c_list"),
        col("list_id") === col("c_list") && col("query_id") =!= col(idCol))
    def norm(v: Column): Column = sqrt(Similarity.dot(v, v))
    val cos = when(norm(col("qv")) * norm(col("v")) > 0,
      Similarity.dot(col("qv"), col("v")) / (norm(col("qv")) * norm(col("v"))))
      .otherwise(lit(0.0))
    // bounded top-k aggregation (map-side partial) instead of a global
    // per-query window — see graft.functions.TopK for the scale rationale
    val grouped = cand.select(col("query_id"), col(idCol).as("neighbor_id"), cos.as("cos"))
      .groupBy("query_id")
      .agg(graft.functions.TopK.topK(k)(col("cos"), col("neighbor_id")).as("topk"))
    Similarity.explodeTopK(grouped, Seq("query_id"))
      .select("query_id", "neighbor_id", "rnk", "sim")
  }
}
