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
