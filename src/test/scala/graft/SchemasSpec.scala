package graft

import org.apache.spark.sql.types._

class SchemasSpec extends SparkSpec {
  import spark.implicits._

  private val target = StructType(Seq(
    StructField("id", LongType), StructField("name", StringType),
    StructField("score", DoubleType), StructField("tag", StringType)))

  test("align fills missing columns, widens types, drops extras, orders") {
    // old snapshot: int id (narrower), no tag, a retired column, shuffled order
    val old = Seq((1, "a", 2.5, "junk"), (2, "b", 3.5, "junk"))
      .toDF("id", "name", "score", "retired")
    val aligned = graft.ops.Schemas.align(old, target)
    // names/types/order must match; nullability may stay stricter
    assert(aligned.schema.map(f => (f.name, f.dataType)) ===
      target.map(f => (f.name, f.dataType)))
    val rows = aligned.as[(Long, String, Double, Option[String])].collect().toSet
    assert(rows === Set((1L, "a", 2.5, None), (2L, "b", 3.5, None)))
  }

  test("lossy narrowing fails fast instead of corrupting") {
    val wide = Seq((1L, "a", 2.5, "t")).toDF("id", "name", "score", "tag")
      .selectExpr("id", "name", "CAST(score AS DOUBLE) AS score", "tag")
    val narrowTarget = StructType(Seq(
      StructField("id", LongType), StructField("name", StringType),
      StructField("score", IntegerType), StructField("tag", StringType)))
    val e = intercept[IllegalArgumentException] {
      graft.ops.Schemas.align(wide, narrowTarget)
    }
    assert(e.getMessage.contains("score"))
  }

  test("diff reports added/removed/retyped") {
    val from = StructType(Seq(
      StructField("id", IntegerType), StructField("old_col", StringType),
      StructField("name", StringType)))
    val d = graft.ops.Schemas.diff(from, target).toMap
    assert(d("score") === "added double" && d("tag") === "added string")
    assert(d("old_col") === "removed")
    assert(d("id") === "retyped int -> bigint")
    assert(!d.contains("name"))
  }

  test("aligned old and new snapshots union cleanly") {
    val old = Seq((1, "a")).toDF("id", "name")
    val neu = Seq((2L, "b", 9.0, "x")).toDF("id", "name", "score", "tag")
    val u = graft.ops.Schemas.align(old, target)
      .unionByName(graft.ops.Schemas.align(neu, target))
    assert(u.count() === 2)
    assert(u.schema.map(f => (f.name, f.dataType)) ===
      target.map(f => (f.name, f.dataType)))
  }
}
