package graft

import org.apache.spark.sql.functions._
import graft.ops.{Keys, Sampling}

/** Surrogate long keys: portability, injectivity audit, and the string-key
  * capped sampler matching its integral-key twin.
  */
class KeysSpec extends SparkSpec {
  import spark.implicits._

  test("surrogate is deterministic, non-negative, and 60-bit") {
    val ks = (1 to 1000).map(i => s"key_$i")
    val sids = ks.toDF("k").select(Keys.surrogateId64(col("k"))).as[Long].collect()
    assert(sids.forall(s => s >= 0 && s < (1L << 60)))
    assert(sids.toSet.size === 1000, "no collisions on 1k keys")
    val again = ks.toDF("k").select(Keys.surrogateId64(col("k"))).as[Long].collect()
    assert(sids.toSeq === again.toSeq)
  }

  test("collision audit is empty on distinct real keys and ignores duplicate rows") {
    val docs = Tables.documents(spark, sf())
      .select(concat(lit("d"), col("doc_id")).as("k"))
    assert(Keys.surrogateCollisions(docs, "k").isEmpty)
    // same key twice is NOT a collision (one sid, one distinct key)
    val dup = Seq("a", "a", "b").toDF("k")
    assert(Keys.surrogateCollisions(dup, "k").isEmpty)
  }

  test("cappedPerClassByKey over string keys caps per class deterministically") {
    val docs = Tables.documents(spark, sf())
      .select(col("lang"), concat(lit("d"), col("doc_id")).as("doc_key"))
    val out = Keys.cappedPerClassByKey(docs, "lang", "doc_key", n = 10)
    val byClass = out.groupBy("lang").count().as[(String, Long)].collect().toMap
    val totals = docs.groupBy("lang").count().as[(String, Long)].collect().toMap
    totals.foreach { case (lang, n) =>
      assert(byClass.getOrElse(lang, 0L) === math.min(n, 10L), s"lang $lang")
    }
    val again = Keys.cappedPerClassByKey(docs, "lang", "doc_key", n = 10)
    assert(out.collect().toSet === again.collect().toSet)
    // duplicate rows don't eat cap slots: cap counts KEYS
    val doubled = Keys.cappedPerClassByKey(docs.union(docs), "lang", "doc_key", n = 10)
    assert(doubled.count() === out.count())
  }

  test("string-key cap selects the same docs as the integral twin on numeric keys") {
    // when the key IS numeric, surrogate routing must not change WHICH
    // rows are eligible — both variants keep exactly n per class (the
    // ordering hash differs, so compare counts, not identities)
    val docs = Tables.documents(spark, sf()).select(col("lang"), col("doc_id"))
    val intCap = Sampling.cappedPerClass(docs, "lang", "doc_id", n = 5)
    val strCap = Keys.cappedPerClassByKey(
      docs.select(col("lang"), col("doc_id").cast("string").as("doc_id")),
      "lang", "doc_id", n = 5)
    val a = intCap.groupBy("lang").count().as[(String, Long)].collect().toMap
    val b = strCap.groupBy("lang").count().as[(String, Long)].collect().toMap
    assert(a === b)
  }
}
