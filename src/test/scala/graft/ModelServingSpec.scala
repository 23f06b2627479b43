package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.ops.Classifier
import graft.streaming.ModelServing

/** The generic hot serving cache + the quality-classifier gate built on
  * it: a retrain → save mid-stream takes effect at the next micro-batch
  * with zero restarts, batches cleanly pre/post.
  */
class ModelServingSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Tables.documents(spark, sf())

  private def fs = new org.apache.hadoop.fs.Path("/tmp")
    .getFileSystem(spark.sparkContext.hadoopConfiguration)

  test("classifier gate hot-reloads a retrained model at the next batch; steady " +
      "state never re-collects") {
    val dir = "/tmp/graft_model_serving_clf"
    fs.delete(new org.apache.hadoop.fs.Path(dir), true)
    val wA = Classifier.train(docs, "text", "doc_id", col("lang") === "en",
      buckets = 32, rounds = 2, lr = 0.5)
    val wB = Classifier.train(docs, "text", "doc_id", col("lang") === "de",
      buckets = 32, rounds = 2, lr = 0.5)
    Classifier.save(wA, dir)

    val rows = docs.select($"doc_id", $"text").as[(Long, String)]
      .collect().toSeq.take(120)
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[(Long, String)]
    val swaps = new java.util.concurrent.atomic.AtomicInteger(0)
    val got = new scala.collection.mutable.ArrayBuffer[(Long, Long, Double)]()
    val gate = ModelServing.classifierForeachBatch(dir, "text", "doc_id",
      onSwap = (_, _) => swaps.incrementAndGet()) {
      (scored, batchId) =>
        got.synchronized {
          got ++= scored.select(col("doc_id"), col("score"))
            .collect().map(r => (batchId, r.getLong(0), r.getDouble(1)))
        }
    }
    val q = mem.toDF().toDF("doc_id", "text")
      .writeStream.foreachBatch(gate).start()
    try {
      mem.addData(rows.take(60): _*)
      q.processAllAvailable()
      Classifier.save(wB, dir) // retrain published mid-stream
      mem.addData(rows.drop(60): _*)
      q.processAllAvailable()
    } finally q.stop()

    def expect(w: org.apache.spark.sql.DataFrame, slice: Seq[(Long, String)]) =
      Classifier.scoreWithModel(slice.toDF("doc_id", "text"), "text", "doc_id",
        w, buckets = 32).select("doc_id", "score").collect()
        .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val pre = got.filter(_._1 == 0).map(t => t._2 -> t._3).toMap
    val post = got.filter(_._1 == 1).map(t => t._2 -> t._3).toMap
    assert(pre === expect(wA, rows.take(60)),
      "pre-republish batch must score with the original weights")
    assert(post === expect(wB, rows.drop(60)),
      "post-republish batch must score with the retrained weights")
    assert(swaps.get() === 2, s"expected 2 swaps, saw ${swaps.get()}")
  }

  test("Hot caches by generation: unchanged token = zero loader calls") {
    val dir = "/tmp/graft_model_serving_hot"
    fs.delete(new org.apache.hadoop.fs.Path(dir), true)
    graft.ops.ModelStore.publish(spark, dir, "spec") { staging =>
      Seq(Tuple1(1)).toDF("v").coalesce(1).write.parquet(s"$staging/t")
    }
    val loads = new java.util.concurrent.atomic.AtomicInteger(0)
    val hot = new ModelServing.Hot[Int](dir, (s, p) => {
      loads.incrementAndGet()
      graft.ops.ModelStore.read(s, p, "spec")(cur =>
        s.read.parquet(s"$cur/t").head().getInt(0))
    })
    assert(hot.currentFor(spark) === 1)
    (1 to 5).foreach(_ => hot.currentFor(spark))
    assert(loads.get() === 1)
    graft.ops.ModelStore.publish(spark, dir, "spec") { staging =>
      Seq(Tuple1(2)).toDF("v").coalesce(1).write.parquet(s"$staging/t")
    }
    assert(hot.currentFor(spark) === 2)
    assert(loads.get() === 2)
  }

  test("Hot never goes stale-forever when a publish races the load — the " +
      "post-load re-read reloads instead of caching the old model") {
    val dir = "/tmp/graft_model_serving_hot_race"
    fs.delete(new org.apache.hadoop.fs.Path(dir), true)
    def publishOne(v: Int): Unit =
      graft.ops.ModelStore.publish(spark, dir, "spec") { staging =>
        Seq(Tuple1(v)).toDF("v").coalesce(1).write.parquet(s"$staging/t")
      }
    publishOne(1)
    // the forged window: the loader reads the OLD model and a publish
    // completes before it returns — pre-fix, (newGen, oldModel) was
    // cached and no later batch ever saw the generation move again
    val loads = new java.util.concurrent.atomic.AtomicInteger(0)
    val hot = new ModelServing.Hot[Int](dir, (s, p) => {
      val v = graft.ops.ModelStore.read(s, p, "spec")(cur =>
        s.read.parquet(s"$cur/t").head().getInt(0))
      if (loads.incrementAndGet() == 1) publishOne(2)
      v
    })
    assert(hot.currentFor(spark) === 2,
      "the re-read must detect the racing publish and serve the new model")
    assert(hot.currentFor(spark) === 2, "and the cache must have settled on it")
    assert(loads.get() === 2, "exactly one extra load, then steady state")
  }

  test("a hot load running ENTIRELY inside the publisher's bump→rename window " +
      "cannot cache stale-forever — the post-commit second bump re-detects") {
    val dir = "/tmp/graft_model_serving_hot_window"
    fs.delete(new org.apache.hadoop.fs.Path(dir), true)
    def loader(s: org.apache.spark.sql.SparkSession, p: String): Int =
      graft.ops.ModelStore.read(s, p, "spec")(cur =>
        s.read.parquet(s"$cur/t").head().getInt(0))
    graft.ops.ModelStore.publish(spark, dir, "spec") { staging =>
      Seq(Tuple1(1)).toDF("v").coalesce(1).write.parquet(s"$staging/t")
    }
    val hot = new ModelServing.Hot[Int](dir, loader)
    assert(hot.currentFor(spark) === 1)
    // the forged window (afterGenBump seam): generation already moved,
    // current/ still the OLD model — the load starts and completes here,
    // so every token it reads is the post-bump value and the re-read
    // passes. Pre-fix the settled token EQUALLED that value, so the
    // (newGen, oldModel) cache entry never invalidated: stale forever.
    var inWindow = -1
    graft.ops.ModelStore.publish(spark, dir, "spec",
        afterGenBump = () => inWindow = hot.currentFor(spark)) { staging =>
      Seq(Tuple1(2)).toDF("v").coalesce(1).write.parquet(s"$staging/t")
    }
    assert(inWindow === 1, "inside the window the OLD model serves — complete, " +
      "linearized before the publish")
    assert(hot.currentFor(spark) === 2,
      "the next batch must pick up the republish — never stale-forever")
  }

  test("classifier gate is self-describing: a retrain that CHANGED the bucket " +
      "count hot-swaps into correctly-bucketed scores") {
    val dir = "/tmp/graft_model_serving_clf_rebucket"
    fs.delete(new org.apache.hadoop.fs.Path(dir), true)
    val wA = Classifier.train(docs, "text", "doc_id", col("lang") === "en",
      buckets = 32, rounds = 1, lr = 0.5)
    val wB = Classifier.train(docs, "text", "doc_id", col("lang") === "en",
      buckets = 8, rounds = 1, lr = 0.5)
    Classifier.save(wA, dir, buckets = 32)

    val rows = docs.select($"doc_id", $"text").as[(Long, String)]
      .collect().toSeq.take(80)
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[(Long, String)]
    val got = new scala.collection.mutable.ArrayBuffer[(Long, Long, Double)]()
    val gate = ModelServing.classifierForeachBatch(dir, "text", "doc_id") {
      (scored, batchId) =>
        got.synchronized {
          got ++= scored.select(col("doc_id"), col("score"))
            .collect().map(r => (batchId, r.getLong(0), r.getDouble(1)))
        }
    }
    val q = mem.toDF().toDF("doc_id", "text")
      .writeStream.foreachBatch(gate).start()
    try {
      mem.addData(rows.take(40): _*)
      q.processAllAvailable()
      Classifier.save(wB, dir, buckets = 8) // rebucketing retrain mid-stream
      mem.addData(rows.drop(40): _*)
      q.processAllAvailable()
    } finally q.stop()

    def expect(w: org.apache.spark.sql.DataFrame, b: Int,
        slice: Seq[(Long, String)]) =
      Classifier.scoreWithModel(slice.toDF("doc_id", "text"), "text", "doc_id",
        w, buckets = b).select("doc_id", "score").collect()
        .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got.filter(_._1 == 0).map(t => t._2 -> t._3).toMap ===
      expect(wA, 32, rows.take(40)))
    assert(got.filter(_._1 == 1).map(t => t._2 -> t._3).toMap ===
      expect(wB, 8, rows.drop(40)),
      "post-swap scores must use the NEW bucket count from the model meta")
  }

  test("a model saved without hyperparameter meta refuses the serving load with " +
      "a re-save pointer — never guessed hashing") {
    val dir = "/tmp/graft_model_serving_clf_nometa"
    fs.delete(new org.apache.hadoop.fs.Path(dir), true)
    // forge the pre-r20 layout: a publish that wrote only the weights
    val w = Classifier.train(docs, "text", "doc_id", col("lang") === "en",
      rounds = 1)
    graft.ops.ModelStore.publish(spark, dir, "classifier model") { staging =>
      w.write.parquet(s"$staging/weights")
    }
    val e = intercept[IllegalStateException](Classifier.loadLocal(spark, dir))
    assert(e.getMessage.contains("no hyperparameter meta") &&
      e.getMessage.contains("re-save"))
    assert(Classifier.load(spark, dir).count() > 0,
      "the weights-only batch load stays serveable for oracle replay")
  }
}
