package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Global order statistics at scale: rank + running total in a TOTAL order
  * without ever serializing the dataset through one reducer.
  *
  * The naive form (`row_number().over(Window.orderBy(...))` with no
  * partitioning) moves the whole dataset to a single partition — the
  * classic scale-killer. Here instead:
  *
  *  1. `repartitionByRange` on the sort key — an order-preserving shuffle:
  *     partition i holds keys strictly before partition i+1's (equal full
  *     keys land in one partition);
  *  2. per-partition rank/cumsum (window PARTITIONED by the physical
  *     partition id — parallel, state bounded by partition size);
  *  3. per-partition row/value totals (one tiny side table of
  *     #partitions rows) get prefix offsets through a single bounded
  *     window and broadcast back; global rank/cum = offset + local.
  *
  * Same two-level prefix-sum shape as [[Packing.assignBins]], but in a
  * USER-CHOSEN total order (range partitioning) rather than a hash-derived
  * one. Determinism requires the sort key to be a total order (unique);
  * with duplicate full keys the ranks within a tie group are arbitrary.
  */
object Ordered {

  /** Adds `rank` (1-based position in the global sort order) and `cum`
    * (running sum of `valCol` through each row, inclusive) to `df`.
    */
  def rankedPrefixSum(df: DataFrame, sortCols: Seq[Column], valCol: Column,
      partitions: Int = 0): DataFrame = {
    val n =
      if (partitions > 0) partitions
      else df.sparkSession.conf.get("spark.sql.shuffle.partitions").toInt
    val parts = df.repartitionByRange(n, sortCols: _*)
      .withColumn("__pid", spark_partition_id().cast("long"))
    val w = Window.partitionBy("__pid").orderBy(sortCols: _*)
    val wRows = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val local = parts
      .withColumn("__lrank", row_number().over(w).cast("long"))
      .withColumn("__lcum", sum(valCol).over(wRows).cast("long"))
    // offsets: #partitions rows through one bounded single-partition window
    val wOff = Window.orderBy("__pid").rowsBetween(Window.unboundedPreceding, -1)
    val offsets = parts.groupBy("__pid")
      .agg(count(lit(1)).as("__n"), sum(valCol).cast("long").as("__tot"))
      .select(col("__pid"),
        coalesce(sum("__n").over(wOff), lit(0L)).as("__rank_off"),
        coalesce(sum("__tot").over(wOff), lit(0L)).as("__cum_off"))
    local.join(broadcast(offsets), "__pid")
      .withColumn("rank", col("__rank_off") + col("__lrank"))
      .withColumn("cum", col("__cum_off") + col("__lcum"))
      .drop("__pid", "__lrank", "__lcum", "__rank_off", "__cum_off")
  }
}
