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
}
