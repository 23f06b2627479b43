package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation utilities (the 100 TB concern: one hot key melting one
  * reducer while 999 executors idle).
  *
  * Spark's AQE already rewrites skewed SHUFFLE joins at runtime; these
  * helpers cover the cases AQE can't: streaming stateful aggregation (state
  * is partitioned by key for the query's lifetime) and deliberate two-phase
  * rollups.
  *
  * Salting is deterministic (hash of a spreading column, never rand()) so
  * retried tasks and the DuckDB oracle reproduce results exactly.
  */
object Skew {

  /** Deterministic salt in [0, salts) from a spreading column (any
    * high-cardinality column; the row's own id is ideal). xxhash64 is the
    * codegen'd native hash — no string materialization per row, unlike a
    * crc32-over-cast, which at 100 TB is a measurable map-side tax on
    * every fact row.
    */
  def saltOf(spreadCol: Column, salts: Int): Column =
    pmod(xxhash64(spreadCol), lit(salts)).cast("int")

  /** Two-phase salted aggregation: partial aggregate on (key, salt) —
    * spreading a hot key over `salts` reducers — then final aggregate on
    * key. Results identical to a direct groupBy(key).agg(count/sum).
    */
  def saltedAgg(df: DataFrame, keyCol: String, spreadCol: String, salts: Int,
      sums: (String, String)*): DataFrame = {
    val partial = df
      .withColumn("__salt", saltOf(col(spreadCol), salts))
      .groupBy(col(keyCol), col("__salt"))
      .agg(count(lit(1)).as("__cnt"),
        sums.map { case (c, a) => sum(col(c)).as(s"__sum_$a") }: _*)
    partial.groupBy(keyCol)
      .agg(sum("__cnt").as("cnt"),
        sums.map { case (_, a) => sum(s"__sum_$a").as(a) }: _*)
  }

  /** Skew-proof equi-join for a skewed FACT side against a small-ish DIM
    * side: fact rows get a deterministic salt, the dim side is replicated
    * `salts`× (explode), and the join key becomes (key, salt) — the hot
    * key's rows land on `salts` different reducers. Result equals the
    * unsalted join.
    */
  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String, spreadCol: String,
      salts: Int): DataFrame = {
    val f = fact.withColumn("__salt", saltOf(col(spreadCol), salts))
    val d = dim.withColumn("__salt", explode(sequence(lit(0), lit(salts - 1))))
    f.join(d, f(key) === d(key) && f("__salt") === d("__salt"))
      .drop(d(key)).drop(f("__salt")).drop(d("__salt"))
  }
}
