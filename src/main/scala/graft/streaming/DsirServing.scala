package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}

import graft.ops.Dsir
import graft.ops.Dsir.DsirModel

/** HOT-RELOADING DSIR gate for a live stream (r19) — the serve-through
  * story one level up from the index family: [[Dsir.save]]'s atomic
  * publish and [[Dsir.scoreWith]]'s stateless serving projection exist,
  * but a plain `scoreWith` stream pins the model's λ/cutoff LITERALS at
  * plan time, so republishing the model required a query restart
  * (downtime) to take effect.
  *
  * The reload rides `foreachBatch`: each micro-batch re-reads the
  * published model's commit generation ([[Dsir.publishGeneration]] — one
  * tiny token read, no parquet touched) and reloads the model ONLY when
  * the generation moved, then scores the WHOLE batch with that one
  * model. The guarantees this buys:
  *
  *  - batches are cleanly pre- or post-republish — a batch is scored by
  *    exactly one model, never a λ/cutoff mix ([[Dsir.load]] is
  *    publish-atomic and internally retries a racing save);
  *  - zero refusals and zero downtime at the republish: the old model
  *    keeps serving until the batch AFTER the commit, which picks up the
  *    new one;
  *  - steady-state cost is one token read per micro-batch — the model
  *    reload (a B-row parquet read) happens only on an actual republish.
  *
  * Ordering note: the generation is read BEFORE the load and RE-READ
  * after it ([[ModelServing.Hot]], r20) — a publish landing anywhere
  * around the load costs at most one extra load or one stale batch
  * (the publisher's post-commit second generation bump makes any
  * mid-swap token observation distinguishable from steady state), never
  * a cache that serves a superseded model until the NEXT republish.
  *
  * Scale shape: the per-batch scoring plan is the same zero-shuffle
  * Scan→Project as batch `scoreWith` — state lives only on the driver
  * (one B-entry λ array), nothing accumulates, and the gate applies
  * unchanged at any rate the sink keeps up with.
  */
object DsirServing {

  /** Driver-side model cache keyed by publish generation — a
    * [[ModelServing.Hot]] over [[Dsir.load]] (the generic mechanism was
    * factored out of this class; semantics unchanged). Thread-safe;
    * shared across however many streams serve the same model path.
    * `onSwap(generation, model)` fires on every reload — observability
    * for "which model scored batch N".
    */
  final class HotModel(modelPath: String,
      onSwap: (String, DsirModel) => Unit = (_, _) => ()) extends Serializable {
    private val hot = new ModelServing.Hot[DsirModel](modelPath,
      (s, p) => Dsir.load(s, p), onSwap)

    /** The model to score THIS batch with — reloaded iff the published
      * generation moved since the last batch.
      */
    def currentFor(spark: SparkSession): DsirModel = hot.currentFor(spark)
  }

  /** A `foreachBatch` function serving the gate with hot reload: score
    * the batch with the currently-published model at `modelPath`
    * (reloading on republish), then hand the scored frame —
    * (idCol, n_feats, weight_micro, keep), the [[Dsir.scoreWith]]
    * shape — to `sink` with the batch id. Usage:
    *
    * {{{
    * val gate = DsirServing.gatedForeachBatch(path, "text", "doc_id") {
    *   (scored, batchId) => scored.filter(col("keep")).write...
    * }
    * stream.writeStream.foreachBatch(gate).start()
    * }}}
    */
  def gatedForeachBatch(modelPath: String, textCol: String, idCol: String,
      onSwap: (String, DsirModel) => Unit = (_, _) => ())
      (sink: (DataFrame, Long) => Unit): (Dataset[Row], Long) => Unit = {
    val hot = new HotModel(modelPath, onSwap)
    (batch: Dataset[Row], batchId: Long) => {
      val model = hot.currentFor(batch.sparkSession)
      sink(Dsir.scoreWith(batch.toDF(), textCol, idCol, model), batchId)
    }
  }

  /** The MULTI-GATE router with hot reload: D domain gates
    * ([[Dsir.scoreWithMany]] — features hashed once, D λ folds, one
    * Scan→Project) each backed by its own model path, each reloading
    * independently when ITS publish generation moves. Republishing one
    * domain's gate swaps only that domain — the other D−1 keep serving
    * their cached models, and the batch is still scored by exactly one
    * model per domain (per-batch resolution happens before scoring).
    * `scoreWithMany`'s shared-hash contract ((buckets, alpha) equal
    * across models) is re-checked on every swap, so a republish that
    * breaks it fails LOUDLY at the reload, never as silent mis-bucketed
    * scores.
    */
  def multiGatedForeachBatch(models: Seq[(String, String)], textCol: String,
      idCol: String, onSwap: (String, String, DsirModel) => Unit = (_, _, _) => ())
      (sink: (DataFrame, Long) => Unit): (Dataset[Row], Long) => Unit = {
    require(models.nonEmpty, "need at least one (domain, modelPath) gate")
    val hots = models.map { case (domain, path) =>
      domain -> new HotModel(path, (g, m) => onSwap(domain, g, m))
    }
    (batch: Dataset[Row], batchId: Long) => {
      val resolved = hots.map { case (d, h) => d -> h.currentFor(batch.sparkSession) }
      sink(Dsir.scoreWithMany(batch.toDF(), textCol, idCol, resolved), batchId)
    }
  }
}
