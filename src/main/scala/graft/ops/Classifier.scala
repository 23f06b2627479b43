package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed training + inference of a fastText-style hashed bag-of-words
  * linear classifier — the quality-filter model family of LLM data
  * pipelines (CCNet's wiki-reference LR, the LLaMA/GPT-3 "looks like good
  * text" filters): hash tokens into `buckets` features, train logistic
  * regression by full-batch gradient descent, score the corpus.
  *
  * Everything is INTEGER-EXACT in micro-units, so training itself is
  * partition-order-independent and the DuckDB oracle replays every round
  * bit-for-bit (the pageRankInt / KMeans determinism contract, applied to
  * model TRAINING):
  *  - weights live as micro-unit longs; per-(doc,bucket) dot terms and
  *    gradient contributions are floored to micro BEFORE summation, so
  *    all corpus-sized sums are exact long arithmetic;
  *  - the only nonlinearity is the rational "fast sigmoid"
  *    σ(z) = 1/2 + z/(2(1+|z|)) — just +,*,/,abs, each IEEE-correctly-
  *    rounded and therefore engine-identical; no exp/ln whose last-ulp
  *    behavior could differ between libms (cf. Text.bm25's ln, which is
  *    confined to |terms| distinct values — a per-row per-round exp here
  *    would be |corpus|·rounds roll-of-the-dice floors).
  *
  * Scale shape per round:
  *  - the weight table (≤ buckets+1 rows) BROADCASTS into the feature
  *    join; the corpus-sized features are scanned, never re-shuffled —
  *    the per-doc margin is a map-side join + one groupBy(doc) whose key
  *    is the feature table's own key;
  *  - the gradient reduce shuffles ≤ buckets+1 aggregated rows (map-side
  *    partial sums of longs), independent of corpus size;
  *  - features are materialized ONCE (localCheckpoint) and reused by all
  *    rounds + final scoring; the tiny weight frame is checkpointed per
  *    round so plan depth stays constant in `rounds` ([[Lineage]]
  *    discipline).
  */
object Classifier {

  /** σ(z) = 1/2 + z/(2(1+|z|)) — monotone, bounded to (0,1), exact. */
  def sigmoidFast(z: Column): Column =
    lit(0.5) + z / (lit(2.0) * (lit(1.0) + abs(z)))

  /** Token → bucket. `portable = true` is the md5-based [[Text.h32]] the
    * DuckDB oracle reproduces (the correctness-gate default); `false` is
    * codegen'd xxhash64 — ~3× serving throughput (33k → 100k docs/s,
    * measured in tools/StreamBench clf mode), for production serving where the hash
    * only needs to be CONSISTENT between train and serve, not replayable
    * in SQL.
    */
  private def bucketOf(t: Column, buckets: Int, portable: Boolean): Column =
    if (portable) Text.h32(t) % buckets else pmod(xxhash64(t), lit(buckets))

  /** Hashed term-frequency features: (idCol, bucket, x) with
    * bucket = h32(token) mod buckets and x = tf_bucket / doc_len — the
    * fastText input layer, portable md5 hashing so the oracle buckets
    * identically. Token-less documents emit no rows (handled by the
    * left joins downstream).
    */
  def hashedFeatures(df: DataFrame, textCol: String, idCol: String,
      buckets: Int, portableHash: Boolean = true): DataFrame = {
    require(buckets > 0, s"buckets=$buckets must be positive")
    val tok = df
      .select(col(idCol), explode(split(lower(col(textCol)), "\\W+")).as("t"))
      .filter(length(col("t")) > 0)
    val bt = tok.select(col(idCol), bucketOf(col("t"), buckets, portableHash).as("bucket"))
    val tf = bt.groupBy(col(idCol), col("bucket")).agg(count(lit(1)).as("tf"))
    val dl = bt.groupBy(col(idCol)).agg(count(lit(1)).as("dl"))
    tf.join(dl, Seq(idCol))
      .select(col(idCol), col("bucket"),
        (col("tf").cast("double") / col("dl").cast("double")).as("x"))
  }

  /** Per-doc margin against a (bucket, w_micro) weight table (bias = row
    * with bucket −1): z_micro = Σ floor(w_micro·x) + bias_micro, exact
    * longs; z = z_micro/10⁶. Labels frame defines the doc universe.
    */
  private def margins(feats: DataFrame, labs: DataFrame, idCol: String,
      weights: DataFrame): DataFrame = {
    val wB = weights.where(col("bucket") >= 0)
    val bias = weights.where(col("bucket") === -1)
      .agg(coalesce(sum("w_micro"), lit(0L)).as("bias_micro"))
    val zs = feats.join(broadcast(wB), Seq("bucket"))
      .groupBy(col(idCol))
      .agg(sum(floor(col("w_micro").cast("double") * col("x"))).as("zs"))
    labs.join(zs, Seq(idCol), "left").crossJoin(broadcast(bias))
      .select(col(idCol), col("y"),
        ((coalesce(col("zs"), lit(0L)) + col("bias_micro")).cast("double") /
          lit(1000000.0)).as("z"))
  }

  /** Train logistic regression on `label` (cast to 0/1 double) with
    * `rounds` full-batch GD steps at learning rate `lr`. Returns the
    * weight table (bucket, w_micro), bias at bucket −1; weight support =
    * every bucket observed in the corpus.
    */
  def train(df: DataFrame, textCol: String, idCol: String, label: Column,
      buckets: Int = 32, rounds: Int = 2, lr: Double = 0.5,
      portableHash: Boolean = true): DataFrame = {
    require(rounds >= 1, s"rounds=$rounds must be >= 1")
    require(lr > 0, s"lr=$lr must be positive")
    val spark = df.sparkSession
    val labs = df.select(col(idCol), label.cast("double").as("y"))
    // one materialization feeds every round (and the caller's scoring)
    val feats = hashedFeatures(df, textCol, idCol, buckets, portableHash).localCheckpoint(true)
    val nDocs = df.select(col(idCol)).agg(count(lit(1)).as("n"))
    import spark.implicits._
    var w = Seq((-1L, 0L)).toDF("bucket", "w_micro")
    var pinned: Option[DataFrame] = None
    for (r <- 1 to rounds) {
      val p = margins(feats, labs, idCol, w)
        .withColumn("p", sigmoidFast(col("z")))
      val gradB = feats.join(p.select(col(idCol), col("p"), col("y")), Seq(idCol))
        .groupBy(col("bucket"))
        .agg(coalesce(sum(floor((col("p") - col("y")) * col("x") * lit(1000000.0))),
          lit(0L)).as("g_micro"))
      val gradBias = p.agg(coalesce(sum(floor((col("p") - col("y")) * lit(1000000.0))),
        lit(0L)).as("g_micro"))
        .select(lit(-1L).as("bucket"), col("g_micro"))
      val grads = gradB.unionAll(gradBias)
      val step = when(col("n") > 0,
        floor(lit(lr) * col("g_micro").cast("double") / col("n").cast("double")))
        .otherwise(lit(0L)).cast("long")
      // grads carry the full weight support (every observed bucket + bias),
      // so the new weights are grads-left-join-old, never the reverse
      val next = grads.join(w, Seq("bucket"), "left")
        .crossJoin(broadcast(nDocs))
        .select(col("bucket"), (coalesce(col("w_micro"), lit(0L)) - step).as("w_micro"))
        .localCheckpoint(true)
      pinned.foreach(Lineage.release)
      pinned = Some(next)
      w = next
    }
    // the feature table is corpus-sized and non-recomputable; the
    // returned weights are themselves checkpointed (≤ buckets+1 rows), so
    // nothing lazy still reads feats — release it here instead of pinning
    // a doc×bucket copy of the corpus per training run (r20)
    Lineage.release(feats)
    w
  }

  /** Score a corpus with a trained weight table: (idCol, y, score) with
    * score = σ(z) floored to 6 dp (the export convention; z itself is
    * already engine-exact).
    */
  def score(df: DataFrame, textCol: String, idCol: String, label: Column,
      weights: DataFrame, buckets: Int = 32,
      portableHash: Boolean = true): DataFrame = {
    val labs = df.select(col(idCol), label.cast("double").as("y"))
    val feats = hashedFeatures(df, textCol, idCol, buckets, portableHash)
    margins(feats, labs, idCol, weights)
      .select(col(idCol), col("y"), Text.floor6(sigmoidFast(col("z"))).as("score"))
  }

  /** Stateless per-row scoring — the MODEL-SERVING form, for streams: the
    * trained weight table is collected into a literal map (model-bounded,
    * ≤ buckets+1 entries — the Ivf/Pca model-load precedent) and the whole
    * score is one per-row expression: no join, no aggregation, append-mode
    * streaming-legal.
    *
    * Bit-identical to [[score]]: the same per-bucket floor(w·tf/dl) micro
    * terms are produced (per-row over the doc's distinct buckets instead
    * of via the corpus-level feature join), and long addition is
    * order-insensitive, so z_micro matches the relational path exactly.
    * Output: (idCol, score).
    */
  /** @param keepCols extra input columns carried through unchanged —
    *                  e.g. the weak label for an online calibration
    *                  monitor, where joining it back would be an illegal
    *                  stream-stream self-join. Default keeps the
    *                  original (idCol, score) contract.
    */
  def scoreWithModel(df: DataFrame, textCol: String, idCol: String,
      weights: DataFrame, buckets: Int = 32,
      portableHash: Boolean = true, keepCols: Seq[String] = Seq.empty): DataFrame = {
    val wm = weights.collect() // model-bounded: ≤ buckets+1 rows
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    scoreWithLocalModel(df, textCol, idCol, wm, buckets, portableHash, keepCols)
  }

  /** [[scoreWithModel]] over an already-collected weight map — the form a
    * long-lived server caches between micro-batches
    * ([[graft.streaming.ModelServing.classifierForeachBatch]]) so serving
    * costs zero collect jobs per batch. When the map came from a
    * persisted model, take (buckets, portableHash) from
    * [[loadLocal]]'s [[LocalModel]] — they are stored with the weights
    * precisely so no caller has to keep them consistent by convention.
    */
  def scoreWithLocalModel(df: DataFrame, textCol: String, idCol: String,
      wm: Map[Long, Long], buckets: Int = 32,
      portableHash: Boolean = true, keepCols: Seq[String] = Seq.empty): DataFrame = {
    require(buckets > 0, s"buckets=$buckets must be positive")
    val biasMicro = wm.getOrElse(-1L, 0L)
    // r22: ONE native pass per serving row (tokenize → bucket → sorted-run
    // fold; the weight table rides the plan as a dense model-bounded
    // long[]) — the r21 shape still ran an interpreted `aggregate` whose
    // per-distinct-bucket term interpreted a `filter` over the whole
    // bucket array (O(distinct × doc_len) lambda dispatches per streaming
    // row). [[zMicroRef]] keeps the column form; ClassifierSpec pins
    // kernel ≡ reference on the real corpus + null/tokenless/both-hash
    // edges. Long addition is order-insensitive, so the kernel's
    // sorted-run term order ≡ the reference's first-occurrence order.
    val dense = Array.fill(buckets)(0L)
    // keys outside [0, buckets) were unreachable in the map form (tokens
    // only ever bucket into the range) — skipped here the same way
    wm.removed(-1L).foreach { case (b, w) =>
      if (b >= 0 && b < buckets) dense(b.toInt) = w
    }
    val zMicro = org.apache.spark.sql.graft.ClfZSum.clfZSum(
      col(textCol), dense.toSeq, portableHash) + lit(biasMicro)
    df.select(col(idCol) +: keepCols.map(col) :+
      Text.floor6(sigmoidFast(zMicro.cast("double") / lit(1000000.0))).as("score"): _*)
  }

  /** REFERENCE FORM of [[scoreWithLocalModel]]'s z_micro (bias included) —
    * the column expression the kernel replaced, kept for the spec pin.
    */
  private[graft] def zMicroRef(textCol: String, wm: Map[Long, Long],
      buckets: Int, portableHash: Boolean): Column = {
    val biasMicro = wm.getOrElse(-1L, 0L)
    val wb = wm.removed(-1L).toSeq.sortBy(_._1)
    val wmap = map_from_arrays(
      lit(wb.map(_._1).toArray), lit(wb.map(_._2).toArray))
    val toksC = Text.tokens(col(textCol))
    val bksC = transform(toksC, t => bucketOf(t, buckets, portableHash))
    val dl = size(bksC).cast("double")
    val term = (b: Column) =>
      floor(coalesce(element_at(wmap, b), lit(0L)).cast("double") *
        (size(filter(bksC, e => e === b)).cast("double") / dl))
    aggregate(array_distinct(bksC), lit(0L),
      (acc, b) => acc + term(b)) + lit(biasMicro)
  }

  /** Exact ROC AUC of a scored frame — the Mann-Whitney form with the
    * standard ½-credit for ties, in ENGINE-EXACT integer arithmetic:
    *
    *   AUC = [ Σ_{(+,−) pairs} 1(s⁺ > s⁻) + ½·1(s⁺ = s⁻) ] / (n⁺·n⁻)
    *       = Σ_g cp_g · (2·below_g + cn_g)  /  (2·n⁺·n⁻)
    *
    * over micro-quantized score GROUPS g (cp/cn = positive/negative counts
    * at the score, below = negatives strictly below). Scores land on the
    * [0,1] micro grid, so there are AT MOST 10⁶+1 groups no matter the
    * corpus size — the cumulative window runs over the bounded histogram,
    * never the data (the [[graft.ops.Stats.histogramPercentiles]]
    * bounded-window contract). One map-side-combined groupBy(score) is the
    * only data-sized stage. Products ride DECIMAL(38,0); the reported
    * `auc_micro` = 10⁶·num div (2·n⁺·n⁻) is exact for any row count.
    *
    * The training-eval loop this serves: score the corpus against the
    * weak label ([[score]] emits both), read one exact, reproducible
    * ranking-quality number per model candidate.
    */
  def aucExact(scored: DataFrame, scoreCol: String, labelCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val dec = "decimal(38,0)"
    // null LABELS are excluded, not counted as negatives: the otherwise(1L)
    // branch below would silently absorb them, and the DuckDB mirror
    // (FILTER y <> 1, which skips NULL) would disagree on n_neg/AUC
    val q = scored.filter(col(scoreCol).isNotNull && col(labelCol).isNotNull)
      .select(floor(col(scoreCol) * lit(1000000)).cast("long").as("__s"),
        col(labelCol).cast("int").as("__y"))
    val g = q.groupBy("__s").agg(
      sum(when(col("__y") === 1, 1L).otherwise(0L)).as("__cp"),
      sum(when(col("__y") === 1, 0L).otherwise(1L)).as("__cn"))
    // single-partition window over the ≤ 10⁶+1-row score histogram
    val w = Window.orderBy("__s").rowsBetween(Window.unboundedPreceding, -1)
    g.withColumn("__below", coalesce(sum(col("__cn")).over(w), lit(0L)))
      .agg(
        sum(col("__cp")).as("n_pos"), sum(col("__cn")).as("n_neg"),
        sum(col("__cp").cast(dec) *
          (lit(2L) * col("__below") + col("__cn")).cast(dec)).cast(dec).as("__num"))
      .select(col("n_pos"), col("n_neg"),
        when(col("n_pos") > 0 && col("n_neg") > 0,
          expr("cast((1000000 * __num) div (2 * n_pos * n_neg) as bigint)"))
          .as("auc_micro"))
  }

  /** The PR curve on the same bounded-histogram machinery as [[aucExact]]:
    * one point per DISTINCT micro score s — (tp, fp) = positives/negatives
    * scored ≥ s (cumulative from the top), precision/recall as exact
    * truncating micro divisions. At most 10⁶+1 points regardless of corpus
    * size; the only data-sized stage is the map-combined groupBy(score).
    * The threshold-picking view: read the operating point straight off the
    * exact curve instead of sampling thresholds.
    */
  def prCurve(scored: DataFrame, scoreCol: String, labelCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // null labels excluded (not negatives) — same contract as [[aucExact]]
    val q = scored.filter(col(scoreCol).isNotNull && col(labelCol).isNotNull)
      .select(floor(col(scoreCol) * lit(1000000)).cast("long").as("threshold_micro"),
        col(labelCol).cast("int").as("__y"))
    val g = q.groupBy("threshold_micro").agg(
      sum(when(col("__y") === 1, 1L).otherwise(0L)).as("__cp"),
      sum(when(col("__y") === 1, 0L).otherwise(1L)).as("__cn"))
    val fromTop = Window.orderBy(col("threshold_micro").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val all = Window.partitionBy().rowsBetween(
      Window.unboundedPreceding, Window.unboundedFollowing)
    g.withColumn("tp", sum(col("__cp")).over(fromTop))
      .withColumn("fp", sum(col("__cn")).over(fromTop))
      .withColumn("__npos", sum(col("__cp")).over(all))
      .select(col("threshold_micro"), col("tp"), col("fp"),
        expr("(1000000 * tp) div (tp + fp)").as("precision_micro"),
        when(col("__npos") > 0, expr("(1000000 * tp) div __npos"))
          .as("recall_micro"))
  }

  /** Calibration (reliability) bins: decile bands of the micro score with
    * exact per-band counts, positive counts, and mean predicted score —
    * `confidence vs observed rate` read straight off integer divisions
    * (the |mean_score − pos_rate| gap per band is the ECE summand). One
    * map-combined groupBy to ≤ `bands` rows; nothing else is data-sized.
    */
  def calibrationBins(scored: DataFrame, scoreCol: String, labelCol: String,
      bands: Int = 10): DataFrame = {
    require(bands > 1, s"bands must exceed 1, got $bands")
    // null labels excluded (not negatives) — same contract as [[aucExact]]
    scored.filter(col(scoreCol).isNotNull && col(labelCol).isNotNull)
      .select(least(floor(col(scoreCol) * lit(bands)).cast("long"),
        lit(bands - 1L)).as("band"),
        floor(col(scoreCol) * lit(1000000)).cast("long").as("__s"),
        col(labelCol).cast("int").as("__y"))
      .groupBy("band")
      .agg(count(lit(1)).as("n"),
        sum(when(col("__y") === 1, 1L).otherwise(0L)).as("n_pos"),
        sum(col("__s")).as("__ssum"))
      .select(col("band"), col("n"), col("n_pos"),
        expr("__ssum div n").as("mean_score_micro"),
        expr("(1000000 * n_pos) div n").as("pos_rate_micro"))
  }

  /** Persist trained weights — the (bucket, w_micro) frame IS the model
    * (≤ buckets+1 rows, bias at bucket −1), so the lifecycle surface is
    * the [[Ivf]]/[[Pca]] pattern: train once, parquet the model, serve
    * forever from [[scoreWithModel]]. ClassifierSpec pins
    * load∘save ≡ identity through a scoring replay.
    *
    * ATOMIC (r19, [[ModelStore.publish]]): `mode("overwrite")` is
    * delete-then-write — a crash mid-write used to leave a PARTIAL
    * weights table a later scoring pass serves as silently wrong scores
    * (missing buckets read as weight 0). The table now stages and
    * commits with one rename to `current/weights`.
    *
    * The hashing hyperparameters `(buckets, portableHash)` are persisted
    * WITH the weights (r20, `current/meta` — one row): a weight table is
    * meaningless without the feature hashing that produced it, and a
    * hot-serving gate that kept its own configured values would score
    * with silently mis-bucketed features after a retrain that changed
    * them. [[loadLocal]] returns the full self-describing model;
    * `legacyFiles` clears the pre-r19 flat part files the old layout
    * left at the path root.
    */
  def save(weights: DataFrame, path: String, buckets: Int = 32,
      portableHash: Boolean = true): Unit = {
    val spark = weights.sparkSession
    import spark.implicits._
    ModelStore.publish(spark, path, "classifier model",
        legacyNames = Seq("weights"),
        legacyFiles = n => n.startsWith("part-") || n == "_SUCCESS" ||
          n.startsWith("_committed") || n.startsWith("_started")) { staging =>
      weights.write.parquet(s"$staging/weights")
      Seq((buckets, portableHash)).toDF("buckets", "portable")
        .repartition(1).write.parquet(s"$staging/meta")
    }
  }

  /** The trained model a long-lived server caches between micro-batches:
    * collected weight map (≤ buckets+1 entries) PLUS the hashing
    * hyperparameters it was trained with — feed all three to
    * [[scoreWithLocalModel]].
    */
  final case class LocalModel(wm: Map[Long, Long], buckets: Int,
      portableHash: Boolean)

  /** Load weights AND hyperparameters in one consistent
    * ([[ModelStore.read]]-gated) read — both tables from the same
    * publish, never a new weight table under an old hash config. A model
    * saved before the meta table existed refuses with a re-save pointer
    * (serving it under guessed hyperparameters is the silent
    * mis-bucketing this table exists to prevent).
    */
  def loadLocal(spark: org.apache.spark.sql.SparkSession,
      path: String): LocalModel =
    ModelStore.read(spark, path, "classifier model",
        isLegacy = ns => ns.exists(n => n.startsWith("part-") || n == "_SUCCESS")) {
      cur =>
        val fs = new org.apache.hadoop.fs.Path(cur)
          .getFileSystem(spark.sparkContext.hadoopConfiguration)
        if (!fs.exists(new org.apache.hadoop.fs.Path(s"$cur/meta")))
          throw new IllegalStateException(
            s"classifier model at $path has no hyperparameter meta (saved " +
              "before r20) — re-save with Classifier.save(weights, path, " +
              "buckets, portableHash); serving under guessed hashing would " +
              "silently mis-bucket every feature")
        val meta = spark.read.parquet(s"$cur/meta").head()
        val wm = spark.read.parquet(s"$cur/weights").collect()
          .map(r => r.getLong(0) -> r.getLong(1)).toMap
        LocalModel(wm, meta.getAs[Int]("buckets"), meta.getAs[Boolean]("portable"))
    }

  def load(spark: org.apache.spark.sql.SparkSession, path: String): DataFrame =
    ModelStore.read(spark, path, "classifier model",
        // the pre-r19 layout wrote the parquet files AT the path itself
        isLegacy = ns => ns.exists(n => n.startsWith("part-") || n == "_SUCCESS")) {
      cur =>
        // ≤ buckets+1 rows: bind to load-time files so a later republish
        // fails loudly instead of silently re-listing the new table
        val wDir = s"$cur/weights"
        val fs = new org.apache.hadoop.fs.Path(wDir)
          .getFileSystem(spark.sparkContext.hadoopConfiguration)
        val files = fs.listStatus(new org.apache.hadoop.fs.Path(wDir))
          .filter(f => f.isFile && f.getLen > 0 && {
            val n = f.getPath.getName
            !n.startsWith("_") && !n.startsWith(".")
          }).map(_.getPath.toString).toIndexedSeq
        if (files.isEmpty) spark.read.parquet(wDir)
        else spark.read.option("basePath", wDir).parquet(files: _*)
    }
}
