package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.ops.Ivf

/** Streaming twin of IVF search: a PERSISTED index (build → save → load,
  * the lifecycle `ivf_topk` pins against the oracle) serves a query STREAM.
  * Probe ranking is pure literal-centroid math (streaming-legal), candidate
  * generation is a stream-static equi-join on list id against the persisted
  * assignments, and the bounded TopK aggregation runs as a streaming agg —
  * the full batch `search` plan, unchanged, on a stream. Complete-mode
  * memory sink accumulates the result table, which must equal the batch
  * search of the same queries exactly.
  */
class IvfStreamSpec extends SparkSpec {
  import spark.implicits._

  private val dim = 8
  private def corpus = (1L to 120L).map { i =>
    (i, Seq.tabulate(dim)(j => (math.sin(i * 0.91 + j * 1.3) * (j % 3 + 1)).toFloat))
  }

  test("stream probe ≡ batch probe from the same persisted index") {
    implicit val ctx = spark.sqlContext
    val df = corpus.toDF("vec_id", "embedding")
    val path = java.nio.file.Files.createTempDirectory("ivf_stream").toString
    Ivf.save(Ivf.build(df, "vec_id", "embedding", nlist = 4), spark, path)
    val index = Ivf.load(spark, path)

    val queryRows = corpus.filter(_._1 % 10 == 0)
    val input = MemoryStream[(Long, Seq[Float])]
    val q = Ivf.search(index, input.toDF().toDF("vec_id", "embedding"),
        "vec_id", "embedding", k = 3, nprobe = 2)
      .writeStream.format("memory").queryName("ivf_stream")
      .outputMode("complete").start()
    try {
      input.addData(queryRows.take(6): _*); q.processAllAvailable()
      input.addData(queryRows.drop(6): _*); q.processAllAvailable()
      val streamed = spark.table("ivf_stream")
        .as[(Long, Long, Int, Double)].collect().toSet
      val batch = Ivf.search(index, queryRows.toDF("vec_id", "embedding"),
          "vec_id", "embedding", k = 3, nprobe = 2)
        .as[(Long, Long, Int, Double)].collect().toSet
      assert(streamed === batch)
      assert(batch.nonEmpty && batch.groupBy(_._1).forall(_._2.size <= 3))
    } finally q.stop()
  }

  test("empty index on a STREAM yields an empty stream, not an AnalysisException") {
    implicit val ctx = spark.sqlContext
    // build over an empty corpus → no centroids; the empty branch must be
    // streaming-legal (filter(false), not limit(0))
    val empty = Ivf.build(Seq.empty[(Long, Seq[Float])].toDF("vec_id", "embedding"),
      "vec_id", "embedding", nlist = 4)
    assert(empty.centroids.isEmpty)
    val input = MemoryStream[(Long, Seq[Float])]
    val q = Ivf.search(empty, input.toDF().toDF("vec_id", "embedding"),
        "vec_id", "embedding", k = 3, nprobe = 2)
      .writeStream.format("memory").queryName("ivf_stream_empty")
      .outputMode("append").start()
    try {
      input.addData((1L, Seq.fill(dim)(1f))); q.processAllAvailable()
      assert(spark.table("ivf_stream_empty").isEmpty)
    } finally q.stop()
  }
}
