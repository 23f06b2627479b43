package graft.streaming

import java.util.concurrent.atomic.AtomicReference

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}

import graft.ops.{Classifier, ModelStore}

/** Generation-gated HOT model serving over any [[graft.ops.ModelStore]]
  * path — the mechanism behind [[DsirServing]], factored out (r19) so
  * every persisted-model family gets the same zero-downtime republish
  * story: each micro-batch reads the model's publish generation (one
  * tiny token read) and reloads through the caller's loader ONLY when
  * it moved. The ordering argument (generation BEFORE the load — a
  * racing publish costs at most one harmless double-load, never a
  * stale-forever cache) and the batch-boundary guarantee (a batch is
  * scored by exactly one model; [[ModelStore.read]]-backed loaders are
  * publish-atomic and retry a racing save) are [[DsirServing]]'s,
  * inherited unchanged.
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
      */
    def currentFor(spark: SparkSession): T = {
      val gen = ModelStore.generation(spark, modelPath)
      val c = cached.get()
      if (c != null && c._1 == gen) c._2
      else {
        val m = loader(spark, modelPath)
        cached.set((gen, m))
        onSwap(gen, m)
        m
      }
    }
  }

  /** Hot-reloading QUALITY-CLASSIFIER gate — the [[Classifier]] twin of
    * [[DsirServing.gatedForeachBatch]]: retrain → [[Classifier.save]]
    * (atomic publish) and the serving stream picks the new weights up at
    * the next micro-batch, no restart. The weight map (≤ buckets+1
    * entries) is cached driver-side between batches, so steady state
    * costs one token read per batch and ZERO collect jobs. The scored
    * frame handed to `sink` is [[Classifier.scoreWithLocalModel]]'s
    * (idCol, keepCols…, score) shape. (buckets, portableHash) are not
    * persisted with the weights — keep them consistent with training,
    * as with the batch API.
    */
  def classifierForeachBatch(modelPath: String, textCol: String, idCol: String,
      buckets: Int = 32, portableHash: Boolean = true,
      keepCols: Seq[String] = Seq.empty,
      onSwap: (String, Map[Long, Long]) => Unit = (_, _) => ())
      (sink: (DataFrame, Long) => Unit): (Dataset[Row], Long) => Unit = {
    val hot = new Hot[Map[Long, Long]](modelPath,
      (s, p) => Classifier.load(s, p).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap,
      onSwap)
    (batch: Dataset[Row], batchId: Long) => {
      val wm = hot.currentFor(batch.sparkSession)
      sink(Classifier.scoreWithLocalModel(batch.toDF(), textCol, idCol, wm,
        buckets, portableHash, keepCols), batchId)
    }
  }
}
