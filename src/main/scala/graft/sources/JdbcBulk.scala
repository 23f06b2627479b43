package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** JDBC **bulk** source (SURVEY §2.1 S2 — Connect's `MODE_BULK`, reference
  * `DatabaseWordCount.java:99-103`): re-scan the whole table per poll.
  *
  * In Spark the natural shape is a batch read per trigger; for periodic
  * re-processing drive [[read]] from a scheduled batch job or a
  * rate-triggered foreachBatch loop. For parallel scans of big tables pass
  * `partitionColumn` bounds — Spark generates one JDBC query per range
  * partition (the reference's bulk source was a single serial SELECT).
  */
object JdbcBulk {

  def read(spark: SparkSession, url: String, table: String): DataFrame =
    spark.read.format("jdbc").option("url", url).option("dbtable", table).load()

  /** Range-partitioned parallel scan. */
  def readPartitioned(spark: SparkSession, url: String, table: String,
      partitionColumn: String, lowerBound: Long, upperBound: Long,
      numPartitions: Int): DataFrame =
    spark.read.format("jdbc")
      .option("url", url).option("dbtable", table)
      .option("partitionColumn", partitionColumn)
      .option("lowerBound", lowerBound).option("upperBound", upperBound)
      .option("numPartitions", numPartitions)
      .load()

  /** Register the database as a DSv2 JDBC CATALOG with aggregate pushdown
    * on: `spark.table("<name>.<schema>.<table>")` scans then compile
    * MIN/MAX/COUNT/SUM group-bys INTO the database query (the plan shows
    * `PushedAggregates`), so a DB-side rollup ships one row per group over
    * the wire instead of the table. The `format("jdbc")` V1 path above
    * pushes filters but never aggregates — catalog registration is the
    * Spark-native lever for DB-side aggregation, and the 100 TB reason is
    * bandwidth: a bulk-mode poll that only needs per-key counts should
    * not move the fact table. (JdbcSpec pins the pushed plan and its
    * agreement with the in-Spark aggregation.)
    */
  def registerCatalog(spark: SparkSession, name: String, url: String,
      driver: Option[String] = None): Unit = {
    spark.conf.set(s"spark.sql.catalog.$name",
      "org.apache.spark.sql.execution.datasources.v2.jdbc.JDBCTableCatalog")
    spark.conf.set(s"spark.sql.catalog.$name.url", url)
    driver.foreach(d => spark.conf.set(s"spark.sql.catalog.$name.driver", d))
    spark.conf.set(s"spark.sql.catalog.$name.pushDownAggregate", "true")
    spark.conf.set(s"spark.sql.catalog.$name.pushDownLimit", "true")
  }
}
