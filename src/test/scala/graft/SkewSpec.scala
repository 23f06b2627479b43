package graft

import org.apache.spark.sql.functions._
import graft.ops.Skew

/** Skew mitigation: salted two-phase aggregation and salted replicated
  * join must produce results identical to their unsalted counterparts
  * while spreading hot keys across `salts` reducers.
  */
class SkewSpec extends SparkSpec {
  import spark.implicits._

  // 90% of rows on one hot key
  private def skewed = (1 to 1000).map { i =>
    (if (i <= 900) "hot" else s"k${i % 17}", i.toLong, i.toDouble)
  }.toDF("key", "id", "v")

  test("salted aggregation equals direct aggregation") {
    val direct = skewed.groupBy("key")
      .agg(count(lit(1)).as("cnt"), sum($"v").as("sv"))
      .as[(String, Long, Double)].collect().toSet
    val salted = Skew.saltedAgg(skewed, "key", "id", salts = 8, ("v", "sv"))
      .as[(String, Long, Double)].collect().toSet
    assert(salted === direct)
  }

  test("salted join equals direct join, hot key spread over salts partitions") {
    val dim = Seq(("hot", "H"), ("k1", "A"), ("k2", "B"), ("k3", "C")).toDF("key", "label")
    val direct = skewed.join(dim, "key").select($"id", $"label")
      .as[(Long, String)].collect().toSet
    val salted = Skew.saltedJoin(skewed, dim, "key", "id", salts = 8)
      .select($"id", $"label").as[(Long, String)].collect().toSet
    assert(salted === direct)
    // the hot key's rows really carry multiple distinct salt values
    val saltCard = skewed.filter($"key" === "hot")
      .select(Skew.saltOf($"id", 8)).distinct().count()
    assert(saltCard > 1)
  }
}
