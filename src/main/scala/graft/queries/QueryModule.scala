package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** A named group of driver-contract queries plus their DuckDB oracle SQL.
  * Contract: every key in `oracle` must exist in `queries`, and the oracle's
  * output column names must match the Spark result's column names exactly
  * (the driver sorts columns by name before hashing).
  */
trait QueryModule {
  def queries: Map[String, (SparkSession, String) => DataFrame]
  def oracle: Map[String, String]
}

/** Shared persisted-model fixture naming: the declared query WRITES the
  * fixture at this path and the oracle SQL READS the same parquet, so the
  * recipe must be one definition — a drift between the engine-written and
  * oracle-read path silently breaks the model-lifecycle rows.
  */
object Fixtures {
  def path(base: String, d: String): String =
    base + "_" + d.replaceAll("[^A-Za-z0-9]", "_")

  /** The dataset dir the driver's DuckDB gate runs at — oracle SQL pins
    * its fixture paths to this one.
    */
  val OracleSf = "/root/testdata/sf0.01"
}
