package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import java.nio.file.Files

/** Guards `Tables.transformEvents` against testdata-generation drift.
  *
  * The driver regenerated the testdata between rounds 8 and 9, silently
  * switching `events.ts` from parquet TIMESTAMP(NANOS) (read as an
  * epoch-nanos long under `nanosAsLong`) to timestamp[us] (read as
  * TIMESTAMP_NTZ) — which zeroed 32 oracle queries for a round. This spec
  * writes a tiny fixture in each encoding and loads both through
  * `Tables.load`, so the next schema change fails a NAMED test instead of
  * a round: whatever the generator emits, the loader contract is the same
  * two columns (`ts` TIMESTAMP µs, `ts_ns` epoch-nanos long) with
  * identical values across encodings.
  */
class TablesSchemaSpec extends SparkSpec {

  // one known instant, µs precision: 1995-06-17 12:34:56.789012 UTC
  private val instantUs = 803392496789012L

  private def loaded(dir: String) = Tables.load(spark, dir, "events")

  private def writeFixture(makeTs: org.apache.spark.sql.Column): String = {
    val dir = Files.createTempDirectory("graft-events-fixture").toString
    spark.range(1).select(
        lit(1L).as("event_id"),
        makeTs.as("ts"),
        lit(42L).as("user_id"),
        lit("click").as("event_type"),
        lit(1.5).as("value"),
        lit("{}").as("props"))
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  private def assertContract(dir: String): Unit = {
    val df = loaded(dir)
    assert(df.schema("ts").dataType === TimestampType)
    assert(df.schema("ts_ns").dataType === LongType)
    val row = df.select(col("ts_ns"), unix_micros(col("ts")).as("us")).head()
    assert(row.getLong(0) === instantUs * 1000L, "ts_ns must be exact epoch nanos")
    assert(row.getLong(1) === instantUs, "ts must carry the same instant at µs precision")
  }

  test("current testdata generation: ts as timestamp[us] (NTZ) loads to the contract") {
    // timestamp_micros gives TIMESTAMP; cast to NTZ mimics pandas' naive
    // timestamp[us] write (parquet isAdjustedToUTC=false) under UTC session
    val dir = writeFixture(timestamp_micros(lit(instantUs)).cast(TimestampNTZType))
    assertContract(dir)
  }

  test("legacy testdata generation: ts as epoch-nanos int64 loads to the contract") {
    // a real TIMESTAMP(NANOS) column arrives as LongType via
    // spark.sql.legacy.parquet.nanosAsLong (Spark can't WRITE nanos
    // parquet, so the fixture writes the post-read shape: a raw int64) —
    // the loader branch under test is the same either way
    val dir = writeFixture(lit(instantUs * 1000L))
    assertContract(dir)
  }

  test("the real driver testdata at sf0.001 satisfies the loader contract") {
    val df = loaded(sf())
    assert(df.schema("ts").dataType === TimestampType)
    assert(df.schema("ts_ns").dataType === LongType)
    val bad = df.filter(col("ts_ns") =!= unix_micros(col("ts")) * lit(1000L)).count()
    assert(bad === 0L, "ts and ts_ns must encode the same instant on every row")
  }

  /** The rest of the r9 failure class: every driver table's columns the
    * query surface depends on, with the type families the operators
    * assume. A regeneration that renames a column, widens an int to a
    * string, or swaps the embedding element type fails HERE by table name
    * instead of zeroing a slice of the oracle board. Integral/fractional
    * FAMILIES (not exact widths) are asserted so a benign int32→int64
    * regeneration stays green.
    */
  test("every driver table keeps its query-surface column contract") {
    def family(t: DataType): String = t match {
      case ByteType | ShortType | IntegerType | LongType => "integral"
      case FloatType | DoubleType | _: DecimalType => "fractional"
      case StringType => "string"
      case DateType | TimestampType | TimestampNTZType => "datetime"
      case ArrayType(e, _) => s"array<${family(e)}>"
      case other => other.typeName
    }
    val contract: Map[String, Map[String, String]] = Map(
      "documents" -> Map("doc_id" -> "integral", "text" -> "string",
        "lang" -> "string", "source" -> "string", "n_chars" -> "integral"),
      "embeddings" -> Map("vec_id" -> "integral",
        "embedding" -> "array<fractional>", "label" -> "integral"),
      "events" -> Map("event_id" -> "integral", "user_id" -> "integral",
        "event_type" -> "string", "value" -> "fractional", "props" -> "string"),
      "lineitem" -> Map("l_orderkey" -> "integral", "l_suppkey" -> "integral",
        "l_partkey" -> "integral", "l_quantity" -> "fractional",
        "l_extendedprice" -> "fractional", "l_discount" -> "fractional",
        "l_returnflag" -> "string", "l_shipdate" -> "datetime"),
      "orders" -> Map("o_orderkey" -> "integral", "o_custkey" -> "integral",
        "o_orderdate" -> "datetime", "o_orderstatus" -> "string"),
      "customer" -> Map("c_custkey" -> "integral", "c_nationkey" -> "integral"),
      "supplier" -> Map("s_suppkey" -> "integral", "s_nationkey" -> "integral",
        "s_name" -> "string"),
      "part" -> Map("p_partkey" -> "integral", "p_type" -> "string"),
      "nation" -> Map("n_nationkey" -> "integral", "n_regionkey" -> "integral",
        "n_name" -> "string"),
      "region" -> Map("r_regionkey" -> "integral", "r_name" -> "string"))
    val problems = contract.toSeq.sortBy(_._1).flatMap { case (table, cols) =>
      val schema = Tables.load(spark, sf(), table).schema
      cols.toSeq.sortBy(_._1).flatMap { case (name, fam) =>
        schema.find(_.name == name) match {
          case None => Some(s"$table.$name: MISSING")
          case Some(f) if family(f.dataType) != fam =>
            Some(s"$table.$name: ${family(f.dataType)} (want $fam)")
          case _ => None
        }
      }
    }
    assert(problems.isEmpty, s"driver-table contract drift:\n${problems.mkString("\n")}")
  }
}
