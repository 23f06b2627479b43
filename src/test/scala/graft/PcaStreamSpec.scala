package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.ops.Pca

/** Streaming twin of the PCA projection: a PERSISTED model (fit → save →
  * load, the same externalized-model contract the oracle replays) projects
  * a MemoryStream per micro-batch through the join-free literal-component
  * form, and the stream's accumulated output is row-for-row the batch
  * projection of the same rows — rounding out the streaming twins for the
  * embedding path (LSH / golden-record / session already have theirs).
  */
class PcaStreamSpec extends SparkSpec {
  import spark.implicits._

  test("stream projection ≡ batch projection from the same persisted model") {
    implicit val ctx = spark.sqlContext
    val dim = 4
    val corpus = (1L to 40L).map { i =>
      (i, Seq.tabulate(dim)(j => (math.sin(i * 1.7 + j) * (j + 1)).toFloat))
    }
    val df = corpus.toDF("vec_id", "embedding")
    val path = java.nio.file.Files.createTempDirectory("pca_stream").toString
    Pca.save(Pca.fit(df, "embedding", dim, k = 3), spark, path)
    val model = Pca.load(spark, path)

    val input = MemoryStream[(Long, Seq[Float])]
    val q = Pca.projectVector(input.toDF().toDF("vec_id", "embedding"),
        "vec_id", "embedding", model)
      .writeStream.format("memory").queryName("pca_stream")
      .outputMode("append").start()
    try {
      input.addData(corpus.take(25): _*); q.processAllAvailable()
      input.addData(corpus.drop(25): _*); q.processAllAvailable()
      val streamed = spark.table("pca_stream")
        .as[(Long, Seq[Double])].collect().toMap
      val batch = Pca.projectVector(df, "vec_id", "embedding", model)
        .as[(Long, Seq[Double])].collect().toMap
      assert(streamed === batch)
      // and both agree with the exploded, oracle-checkable form coordinate
      // by coordinate (same centering, same dot, same floor6)
      val exploded = Pca.project(df, "vec_id", "embedding", model)
        .as[(Long, Int, Double)].collect()
        .groupBy(_._1).map { case (id, rs) => id -> rs.sortBy(_._2).map(_._3).toSeq }
      assert(batch === exploded)
    } finally q.stop()
  }

  test("empty model on a STREAM yields an empty stream, not an AnalysisException") {
    implicit val ctx = spark.sqlContext
    // fit over an empty corpus → components are empty; the documented
    // contract is an empty result with the right schema, and the empty
    // branch must be streaming-legal (filter(false), not limit(0))
    val empty = Pca.fit(Seq.empty[(Long, Seq[Float])].toDF("vec_id", "embedding"),
      "embedding", dim = 4, k = 2)
    assert(empty.components.isEmpty)
    val input = MemoryStream[(Long, Seq[Float])]
    val q = Pca.projectVector(input.toDF().toDF("vec_id", "embedding"),
        "vec_id", "embedding", empty)
      .writeStream.format("memory").queryName("pca_stream_empty")
      .outputMode("append").start()
    try {
      input.addData((1L, Seq(1f, 2f, 3f, 4f))); q.processAllAvailable()
      assert(spark.table("pca_stream_empty").isEmpty)
    } finally q.stop()
    // batch twin of the same branch keeps the schema
    val b = Pca.projectVector(Seq((1L, Seq(1f, 2f, 3f, 4f))).toDF("vec_id", "embedding"),
      "vec_id", "embedding", empty)
    assert(b.columns.toSeq === Seq("vec_id", "pvec") && b.isEmpty)
  }
}
