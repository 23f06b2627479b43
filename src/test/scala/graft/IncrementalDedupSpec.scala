package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.ops.{Dedup, IncrementalDedup}

/** ops/IncrementalDedup: persisted-index near-dup maintenance. Pins the
  * contract the oracle relies on — id-ordered incremental batches produce
  * EXACTLY the one-pass batch policy's kept set — plus first-seen
  * semantics through DROPPED docs, replay idempotence, restart-from-disk,
  * and the empty/no-dup edges.
  */
class IncrementalDedupSpec extends SparkSpec {
  import spark.implicits._

  private def freshIndex(tag: String): String = {
    val p = Files.createTempDirectory(s"graft_incr_$tag")
    p.toFile.deleteOnExit()
    s"$p/index"
  }

  private def doc(id: Long, text: String): (Long, String) = (id, text)

  private def df(rows: Seq[(Long, String)]): DataFrame =
    rows.toDF("doc_id", "text")

  private val A = "alpha beta gamma delta epsilon zeta eta theta"
  private val B = "one two three four five six seven eight nine"
  private val C = "red orange yellow green blue indigo violet shade"

  test("id-ordered incremental batches equal the one-pass batch policy on the real corpus") {
    val docs = Tables.documents(spark, sf()).select(col("doc_id"), col("text"))
    val m = docs.agg(max("doc_id")).head.getLong(0)
    val idx = freshIndex("corpus")
    val kept = Seq(
      docs.filter(col("doc_id") <= m / 3),
      docs.filter(col("doc_id") > m / 3 && col("doc_id") <= 2 * m / 3),
      docs.filter(col("doc_id") > 2 * m / 3)
    ).zipWithIndex.map { case (b, i) =>
      IncrementalDedup.addBatch(spark, idx, b, "text", "doc_id", i)
        .select("doc_id")
    }.reduce(_ unionByName _).as[Long].collect().sorted.toSeq
    val batchKept = Dedup.dropNearDuplicates(docs, "text", "doc_id", minJaccard = 0.8)
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(kept === batchKept)
    assert(kept.nonEmpty && kept.size < docs.count(),
      "fixture vacuous — the corpus must actually contain near-dups")
  }

  test("a doc DROPPED in an earlier batch still drops today's copy (first-seen policy)") {
    val idx = freshIndex("dropped")
    val k1 = IncrementalDedup.addBatch(spark, idx,
      df(Seq(doc(1, A), doc(2, A), doc(3, B))), "text", "doc_id", 0)
    assert(k1.select("doc_id").as[Long].collect().sorted === Array(1L, 3L))
    // doc 4 duplicates A — both its prior copies are indexed (1 kept,
    // 2 dropped); doc 5 is fresh content and must survive
    val k2 = IncrementalDedup.addBatch(spark, idx,
      df(Seq(doc(4, A), doc(5, C))), "text", "doc_id", 1)
    assert(k2.select("doc_id").as[Long].collect().sorted === Array(5L))
  }

  test("replaying a batch id is idempotent; restart reads the index from disk") {
    val idx = freshIndex("replay")
    IncrementalDedup.addBatch(spark, idx,
      df(Seq(doc(1, A), doc(2, B))), "text", "doc_id", 0)
    // replay batch 0 with the SAME data: overwrites its own partitions,
    // must not self-match against its previous write
    val k0 = IncrementalDedup.addBatch(spark, idx,
      df(Seq(doc(1, A), doc(2, B))), "text", "doc_id", 0)
    assert(k0.select("doc_id").as[Long].collect().sorted === Array(1L, 2L))
    // "restart": a later batch sees the on-disk index (no shared state)
    val k1 = IncrementalDedup.addBatch(spark, idx,
      df(Seq(doc(10, B), doc(11, C))), "text", "doc_id", 1)
    assert(k1.select("doc_id").as[Long].collect().sorted === Array(11L))
    val stats = IncrementalDedup.indexBucketStats(spark, idx).head()
    assert(stats.getAs[Long]("hot_buckets") === 0L)
    assert(stats.getAs[Long]("max_bucket") >= 2L, "shared buckets must exist")
  }

  test("a changelog stream maintains the index via foreachBatch (the operational pattern)") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val ctx = spark.sqlContext
    val idx = freshIndex("stream")
    val keptIds = scala.collection.mutable.ArrayBuffer[Long]()
    val in = MemoryStream[(Long, String)]
    val q = in.toDF().toDF("doc_id", "text").writeStream.outputMode("append")
      .foreachBatch { (batch: DataFrame, id: Long) =>
        val kept = IncrementalDedup.addBatch(spark, idx, batch,
          "text", "doc_id", batchId = id.toInt)
        keptIds.synchronized {
          keptIds ++= kept.select("doc_id").as[Long].collect()
        }
        ()
      }.start()
    try {
      in.addData(doc(1, A), doc(2, A), doc(3, B)); q.processAllAvailable()
      in.addData(doc(4, A), doc(5, C)); q.processAllAvailable()
      in.addData(doc(6, C), doc(7, B)); q.processAllAvailable()
    } finally q.stop()
    // micro-batches arrived id-ordered, so the streamed kept set equals
    // the one-pass batch policy over everything seen
    val expected = Dedup.dropNearDuplicates(
      df(Seq(doc(1, A), doc(2, A), doc(3, B), doc(4, A), doc(5, C),
        doc(6, C), doc(7, B))), "text", "doc_id")
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(keptIds.sorted.toSeq === expected)
    assert(keptIds.sorted.toSeq === Seq(1L, 3L, 5L))
  }

  test("compaction folds batch partitions into one base; answers are unchanged") {
    val idx = freshIndex("compact")
    IncrementalDedup.addBatch(spark, idx, df(Seq(doc(1, A), doc(2, B))),
      "text", "doc_id", 0)
    IncrementalDedup.addBatch(spark, idx, df(Seq(doc(3, A), doc(4, C))),
      "text", "doc_id", 1)
    IncrementalDedup.compactIndex(spark, idx, uptoExclusive = 2)
    val dirs = new java.io.File(s"$idx/bands").listFiles()
      .filter(_.isDirectory).map(_.getName).sorted
    assert(dirs.toSeq === Seq("batch=-1"), s"expected one base partition, got $dirs")
    // post-compaction batch answers exactly as it would have uncompacted:
    // doc 5 dups A (seen in batches 0 AND 1), doc 6 dups C, doc 7 fresh
    val k2 = IncrementalDedup.addBatch(spark, idx,
      df(Seq(doc(5, A), doc(6, C), doc(7, B + " extra tail words here"))),
      "text", "doc_id", 2)
    assert(k2.select("doc_id").as[Long].collect().sorted === Array(7L))
    // compaction is re-runnable (folds the previous base + new batches)
    IncrementalDedup.compactIndex(spark, idx, uptoExclusive = 3)
    val k3 = IncrementalDedup.addBatch(spark, idx, df(Seq(doc(8, C))),
      "text", "doc_id", 3)
    assert(k3.isEmpty)
  }

  test("EMBEDDING twin: id-ordered incremental batches equal the one-pass batch policy") {
    val e = Tables.load(spark, sf(), "embeddings")
      .select(col("vec_id"), col("embedding"))
    val m = e.agg(max("vec_id")).head.getLong(0)
    val idx = freshIndex("emb")
    val kept = Seq(
      e.filter(col("vec_id") <= m / 3),
      e.filter(col("vec_id") > m / 3 && col("vec_id") <= 2 * m / 3),
      e.filter(col("vec_id") > 2 * m / 3)
    ).zipWithIndex.map { case (b, i) =>
      graft.ops.IncrementalEmbeddingDedup.addBatch(spark, idx, b,
        "embedding", "vec_id", batchId = i, dim = 64, planes = 8, minCos = 0.3)
        .select("vec_id")
    }.reduce(_ unionByName _).as[Long].collect().sorted.toSeq
    val batchKept = graft.ops.Similarity.dropEmbeddingNearDups(
        e, "vec_id", "embedding", dim = 64, planes = 8, minCos = 0.3)
      .select("vec_id").as[Long].collect().sorted.toSeq
    assert(kept === batchKept)
    assert(kept.nonEmpty && kept.size < e.count(),
      "fixture vacuous — the corpus must actually contain cosine near-dups at 0.3")
    val stats = graft.ops.IncrementalEmbeddingDedup.indexBucketStats(spark, idx).head()
    assert(stats.getAs[Long]("hot_buckets") === 0L,
      "cap fired — the equality contract would not apply")
  }

  test("empty and dup-free batches pass through; the index stays readable") {
    val idx = freshIndex("edges")
    val k0 = IncrementalDedup.addBatch(spark, idx,
      df(Seq.empty), "text", "doc_id", 0)
    assert(k0.isEmpty)
    val k1 = IncrementalDedup.addBatch(spark, idx,
      df(Seq(doc(1, A), doc(2, B), doc(3, C))), "text", "doc_id", 1)
    assert(k1.count() === 3, "nothing shares content — all kept")
    val k2 = IncrementalDedup.addBatch(spark, idx,
      df(Seq(doc(4, C))), "text", "doc_id", 2)
    assert(k2.isEmpty, "exact copy of an indexed doc must drop")
  }
}
