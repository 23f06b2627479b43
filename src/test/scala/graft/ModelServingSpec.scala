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
      buckets = 32, onSwap = (_, _) => swaps.incrementAndGet()) {
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
}
