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

  test("append maintenance: assigned lists are true argmins; appended index searches whole") {
    val all = corpus.toDF("vec_id", "embedding")
    val first = all.filter($"vec_id" <= 60L)
    val rest = all.filter($"vec_id" > 60L)
    val path = java.nio.file.Files.createTempDirectory("ivf_append").toString
    Ivf.save(Ivf.build(first, "vec_id", "embedding", nlist = 4), spark, path)
    val built = Ivf.load(spark, path)

    // every appended vector lands on the centroid brute-force says is closest
    val assigned = Ivf.assignToIndex(built, rest, "vec_id", "embedding")
      .select("vec_id", "v", "list_id")
      .as[(Long, Seq[Double], Int)].collect()
    assigned.foreach { case (id, v, listId) =>
      val dists = built.centroids.map(c =>
        c.zip(v).map { case (a, b) => (a - b) * (a - b) }.sum)
      assert(dists(listId) == dists.min, s"vec $id assigned to non-closest list")
    }

    Ivf.append(spark, path, rest, "vec_id", "embedding")
    val appended = Ivf.load(spark, path)
    // the appended index holds everything once and searches find the new rows
    assert(appended.assignments.count() === 120L)
    val queries = all.filter($"vec_id" % 30L === 0L)
    val hits = Ivf.search(appended, queries, "vec_id", "embedding", k = 5, nprobe = 4)
      .select("neighbor_id").as[Long].collect().toSet
    assert(hits.exists(_ > 60L), "search must reach appended vectors")
    // and equals a search over an index with the same assignments built in
    // one shot (same centroids, union of assignments)
    val oneShot = built.copy(assignments =
      built.assignments.unionByName(Ivf.assignToIndex(built, rest, "vec_id", "embedding")))
    val a = Ivf.search(appended, queries, "vec_id", "embedding", k = 5, nprobe = 4)
      .as[(Long, Long, Int, Double)].collect().toSet
    val b = Ivf.search(oneShot, queries, "vec_id", "embedding", k = 5, nprobe = 4)
      .as[(Long, Long, Int, Double)].collect().toSet
    assert(a === b)

    // occupancy audit: totals line up and the balance ratio is sane
    val st = Ivf.listStats(appended)
      .as[(Long, Long, Long, Long, Double)].head()
    assert(st._1 === 4L && st._2 === 120L && st._5 >= 1.0)
  }

  test("append racing a save refuses LOUDLY and adopts nothing — never silent " +
      "loss or old-centroid rows mixed into the rebuilt index") {
    val all = corpus.toDF("vec_id", "embedding")
    val first = all.filter($"vec_id" <= 60L)
    val rest = all.filter($"vec_id" > 60L)
    val path = java.nio.file.Files.createTempDirectory("ivf_append_race").toString
    Ivf.save(Ivf.build(first, "vec_id", "embedding", nlist = 4), spark, path)
    // a rebuild publishes between the append's staging write and its
    // generation re-check (the forged-race seam) — the staged rows were
    // assigned against the superseded centroids
    val e = intercept[java.util.ConcurrentModificationException] {
      Ivf.append(spark, path, rest, "vec_id", "embedding",
        beforeRecheck = () =>
          Ivf.save(Ivf.build(first, "vec_id", "embedding", nlist = 2), spark, path))
    }
    assert(e.getMessage.contains("raced this append"))
    // the published rebuild is exactly what its save wrote — no adopted
    // stale-assignment files, no staging debris
    val after = Ivf.load(spark, path)
    assert(after.centroids.size === 2)
    assert(after.assignments.count() === 60L)
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val names = fs.listStatus(new org.apache.hadoop.fs.Path(path))
      .map(_.getPath.getName).toSet
    assert(!names.exists(_.startsWith("_graft_appendstage_")),
      s"append staging leaked: $names")
    // and a clean re-run against the new index adopts normally
    Ivf.append(spark, path, rest, "vec_id", "embedding")
    assert(Ivf.load(spark, path).assignments.count() === 120L)
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
