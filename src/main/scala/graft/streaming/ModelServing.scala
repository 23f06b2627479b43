package graft.streaming

import java.util.concurrent.atomic.AtomicReference

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}

import graft.ops.{Classifier, ModelStore}

/** Generation-gated HOT model serving over any [[graft.ops.ModelStore]]
  * path — the mechanism behind [[DsirServing]], factored out (r19) so
  * every persisted-model family gets the same zero-downtime republish
  * story: each micro-batch reads the model's publish generation (one
  * tiny token read) and reloads through the caller's loader ONLY when
  * it moved. The ordering argument — generation read BEFORE the load,
  * RE-READ after it, cached only when it held still (r20: the pre-load
  * read alone missed a load running entirely inside the publisher's
  * bump→rename window, which paired the OLD model with the NEW token;
  * with [[ModelStore.publish]]'s post-commit second bump the settled
  * token always differs from any mid-window value, so a racing publish
  * costs at most one extra load or one stale batch, never a
  * stale-forever cache) — and the batch-boundary guarantee (a batch is
  * scored by exactly one model; [[ModelStore.read]]-backed loaders are
  * publish-atomic and retry a racing save) are [[DsirServing]]'s,
  * hardened here for both.
  */
object ModelServing {

  /** Driver-side model cache keyed by publish generation. Thread-safe;
    * shared across streams serving the same path. `onSwap(generation,
    * model)` fires on every reload — specs count swaps, production can
    * log/metric them.
    */
  final class Hot[T](modelPath: String, loader: (SparkSession, String) => T,
      onSwap: (String, T) => Unit = (_: String, _: T) => ())
      extends Serializable {
    @transient private lazy val cached = new AtomicReference[(String, T)](null)

    /** The model to score THIS batch with — reloaded iff the published
      * generation moved since the last batch.
      *
      * The generation is RE-READ after the loader returns and the result
      * is cached only when it did not move (r20): a publish bumps the
      * token before its commit renames, so a load that ran entirely
      * inside that window returns the OLD model under the NEW token —
      * caching that pair would serve it until the next republish.
      * Combined with the publisher's post-commit second bump
      * ([[ModelStore.publish]] step 6), a moved re-read means "reload
      * and the committed model is there"; after the bounded attempts the
      * freshly loaded (complete) model serves this batch UNCACHED and
      * the next batch re-detects.
      */
    def currentFor(spark: SparkSession): T = {
      var attempt = 0
      while (attempt < 4) {
        attempt += 1
        val gen = ModelStore.generation(spark, modelPath)
        val c = cached.get()
        if (c != null && c._1 == gen) return c._2
        val m = loader(spark, modelPath)
        if (ModelStore.generation(spark, modelPath) == gen) {
          cached.set((gen, m))
          onSwap(gen, m)
          return m
        }
        // a publish raced the load: loop — fresh token, fresh load
        if (attempt == 4) return m // serve it uncached; next batch reloads
      }
      sys.error("unreachable")
    }
  }

  /** Hot-reloading QUALITY-CLASSIFIER gate — the [[Classifier]] twin of
    * [[DsirServing.gatedForeachBatch]]: retrain → [[Classifier.save]]
    * (atomic publish) and the serving stream picks the new weights up at
    * the next micro-batch, no restart. The weight map (≤ buckets+1
    * entries) is cached driver-side between batches, so steady state
    * costs one token read per batch and ZERO collect jobs. The scored
    * frame handed to `sink` is [[Classifier.scoreWithLocalModel]]'s
    * (idCol, keepCols…, score) shape. The model is SELF-DESCRIBING
    * (r20): (buckets, portableHash) ride [[Classifier.loadLocal]]'s
    * consistent read, so a retrain that changed the hashing serves
    * correctly at its hot swap — there is no configured copy to drift
    * out of sync and mis-bucket silently.
    */
  def classifierForeachBatch(modelPath: String, textCol: String, idCol: String,
      keepCols: Seq[String] = Seq.empty,
      onSwap: (String, Classifier.LocalModel) => Unit = (_, _) => ())
      (sink: (DataFrame, Long) => Unit): (Dataset[Row], Long) => Unit = {
    val hot = new Hot[Classifier.LocalModel](modelPath,
      (s, p) => Classifier.loadLocal(s, p), onSwap)
    (batch: Dataset[Row], batchId: Long) => {
      val m = hot.currentFor(batch.sparkSession)
      sink(Classifier.scoreWithLocalModel(batch.toDF(), textCol, idCol, m.wm,
        m.buckets, m.portableHash, keepCols), batchId)
    }
  }
}
