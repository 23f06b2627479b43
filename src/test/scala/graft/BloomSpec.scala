package graft

import org.apache.spark.sql.functions._

/** Bloom-pruned joins: exactness (bloom false positives never leak into the
  * result) and the plan shape (scalar-subquery bloom, codegen probe).
  */
class BloomSpec extends SparkSpec {
  import spark.implicits._

  test("semiJoinPruned equals the plain semi join, any overlap pattern") {
    val big = (1L to 5000L).map(i => (i, s"v$i")).toDF("k", "payload")
    // sparse build side + keys absent from big: exercises both bloom hits
    // and definite misses
    val small = ((100L to 200L) ++ Seq(9999L, 10001L)).toDF("bk")
    val pruned = graft.ops.Bloom.semiJoinPruned(big, small, "k", "bk",
      expectedItems = 1L << 10, numBits = 1L << 13)
    val plain = big.join(small.select(col("bk").as("k")), Seq("k"), "left_semi")
    assert(pruned.orderBy("k").collect().toSeq === plain.orderBy("k").collect().toSeq)
  }

  test("a deliberately tiny bloom (high fpp) still yields the exact result") {
    val big = (1L to 2000L).toDF("k")
    val small = (1L to 2000L by 97).toDF("bk")
    // 64 bits for ~21 items: fpp is large, so the prune passes many false
    // positives — the semi join must absorb them all
    val pruned = graft.ops.Bloom.semiJoinPruned(big, small, "k", "bk",
      expectedItems = 16L, numBits = 64L)
    assert(pruned.count() === small.count())
  }

  test("prune leaves no temp views behind") {
    val before = spark.catalog.listTables().filter("isTemporary").count()
    val out = graft.ops.Bloom.semiJoinPruned(
      (1L to 100L).toDF("k"), Seq(3L, 7L).toDF("bk"), "k", "bk")
    assert(spark.catalog.listTables().filter("isTemporary").count() === before)
    assert(out.count() === 2) // the plan still executes after the views drop
  }

  test("wrong arity surfaces as an analysis error, not IndexOutOfBounds") {
    org.apache.spark.sql.graft.BloomOps.register(spark)
    val ex = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT graft_might_contain(CAST(NULL AS BINARY))")
    }
    assert(ex.getMessage.toLowerCase.contains("parameter"))
    intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT graft_bloom_agg(xxhash64('x')) FROM range(1)")
    }
  }

  test("innerJoinPruned preserves inner-join multiplicity") {
    val big = Seq((1L, "a"), (1L, "b"), (2L, "c"), (3L, "d")).toDF("k", "v")
    val small = Seq((1L, 10.0), (1L, 20.0), (3L, 30.0)).toDF("bk", "w")
    val out = graft.ops.Bloom.innerJoinPruned(big, small, "k", "bk")
    // k=1 matches 2×2, k=3 matches 1×1
    assert(out.count() === 5)
    val plain = big.join(small, big("k") === small("bk"))
    assert(out.select("k", "v", "bk", "w").orderBy("k", "v", "w").collect().toSeq
      === plain.select("k", "v", "bk", "w").orderBy("k", "v", "w").collect().toSeq)
  }
}
