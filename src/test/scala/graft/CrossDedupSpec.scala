package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.ops.Dedup

/** Cross-corpus near-dup removal: dedup a "new crawl" (probe) against a
  * retained training corpus (ref) without ever modifying the ref side.
  */
class CrossDedupSpec extends SparkSpec {
  import spark.implicits._

  private def corpus(rows: (Long, String)*): DataFrame =
    rows.toDF("doc_id", "text")

  private val refDocs = corpus(
    (1L, "the quick brown fox jumps over the lazy dog near the river bank today"),
    (2L, "completely unrelated reference material about astrophysics and galaxies"),
    (3L, "short doc"))

  test("probe doc near-identical to a ref doc is dropped; novel docs kept") {
    val probe = corpus(
      // near-copy of ref doc 1 (one word changed at the end)
      (101L, "the quick brown fox jumps over the lazy dog near the river bank tonight"),
      (102L, "a genuinely new document about distributed query engines and shuffles"))
    val kept = Dedup.dropCrossCorpusDups(probe, refDocs, "text", "doc_id",
      minJaccard = 0.5).select("doc_id").as[Long].collect().sorted
    assert(kept.toSeq == Seq(102L))
  }

  test("pairs carry the match and never invent cross-id-space joins") {
    val probe = corpus(
      (1L, "the quick brown fox jumps over the lazy dog near the river bank today"))
    // probe id 1 collides with ref id 1 on purpose: output must still be the
    // (probe_id=1, ref_id=1) pair — id spaces are independent
    val pairs = Dedup.crossCorpusPairs(probe, refDocs, "text", "doc_id",
      minJaccard = 0.8)
      .select("probe_id", "ref_id").as[(Long, Long)].collect()
    assert(pairs.toSeq == Seq((1L, 1L)))
  }

  test("ref corpus is the retained prior: dedup is asymmetric") {
    val probe = corpus(
      (201L, "the quick brown fox jumps over the lazy dog near the river bank today"))
    val kept = Dedup.dropCrossCorpusDups(probe, refDocs, "text", "doc_id",
      minJaccard = 0.8).count()
    assert(kept == 0L) // exact copy in probe is dropped...
    val keptRef = Dedup.dropCrossCorpusDups(refDocs, probe, "text", "doc_id",
      minJaccard = 0.8).count()
    assert(keptRef == 2L) // ...while rerunning the other way drops the ref twin only
  }

  test("over-cap ref bucket is skipped, not enumerated") {
    // 20 identical ref docs share every band bucket; cap 10 → no candidates
    val ref = corpus((1L to 20L).map(i => (i, "same same same same same same")): _*)
    val probe = corpus((100L, "same same same same same same"))
    val pairs = Dedup.crossCorpusPairs(probe, ref, "text", "doc_id",
      minJaccard = 0.1, maxBucket = 10)
    assert(pairs.count() == 0L)
    // and with a roomy cap the same probe matches all 20
    val open = Dedup.crossCorpusPairs(probe, ref, "text", "doc_id",
      minJaccard = 0.1, maxBucket = 1000)
    assert(open.count() == 20L)
  }

  test("mass-duplicated ref content still drops its probe copies (rank reps)") {
    // 2500 identical ref docs overflow any per-bucket cap; the pair
    // surface's skip-cap would wave the probe copy through — the KEPT-SET
    // path verifies against the ref bucket's 1000 lowest-id
    // representatives instead, so the copy drops and novel content stays
    val ref = corpus((1L to 2500L).map(i =>
      (i, "same same same same same same")): _*)
    val probe = corpus(
      (100000L, "same same same same same same"),
      (100001L, "novel words entirely different content written here"))
    val kept = Dedup.dropCrossCorpusDups(probe, ref, "text", "doc_id",
      minJaccard = 0.8).select("doc_id").as[Long].collect().toSeq
    assert(kept === Seq(100001L),
      s"the duplicated probe doc must drop against a dense ref bucket: $kept")
  }

  test("a 10^6-member ref bucket processes via window rank (no collect_list buffer)") {
    // the training set's mass-duplicated boilerplate is exactly what a new
    // crawl duplicates most: pre-r16 the ref panel was built from a
    // per-bucket collect_list — one million-member aggregation buffer.
    // The window-rank shape spills; maxReps=2 keeps verify fan-out
    // test-sized (policy is rank-identical for this fixture).
    val ref = spark.range(1L, 1000001L).select(col("id").as("doc_id"),
      lit("alpha beta gamma delta epsilon zeta eta theta").as("text"))
    val probe = corpus(
      (1L, "alpha beta gamma delta epsilon zeta eta theta"), // copy of the boilerplate
      (2L, "a genuinely new document about distributed query engines"))
    val kept = Dedup.dropCrossCorpusDups(probe, ref, "text", "doc_id",
      minJaccard = 0.8, maxReps = 2).select("doc_id").as[Long].collect().sorted
    assert(kept.toSeq == Seq(2L), "the boilerplate copy must drop, the novel doc survive")
  }

  test("real corpus: every cross pair at 0.8 is a true high-Jaccard pair") {
    val dd = Tables.documents(spark, sf())
    val probe = dd.filter(col("source") >= "src5")
    val ref = dd.filter(col("source") < "src5")
    val pairs = Dedup.crossCorpusPairs(probe, ref, "text", "doc_id",
      minJaccard = 0.8).select("probe_id", "ref_id", "jaccard")
      .as[(Long, Long, Double)].collect()
    // LSH candidates are verified by exact Jaccard, so every emitted pair
    // must satisfy the threshold literally
    assert(pairs.forall(_._3 >= 0.8))
    // and the kept set is exactly probe minus the dropped probe ids
    val keptN = Dedup.dropCrossCorpusDups(probe, ref, "text", "doc_id",
      minJaccard = 0.8).count()
    assert(keptN == probe.count() - pairs.map(_._1).distinct.length)
  }
}
