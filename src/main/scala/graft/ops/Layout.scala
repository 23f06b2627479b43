package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-layout levers: Z-order (Morton) clustering keys.
  *
  * Why it matters at 100 TB: parquet prunes row groups by min/max stats,
  * but sorting by ONE column destroys locality on every other column.
  * Interleaving the bits of two (or more) filter columns gives each sorted
  * run a small bounding box in BOTH dimensions, so range predicates on
  * either column skip most files — the technique Delta/Iceberg expose as
  * `OPTIMIZE ZORDER BY`, here as a plain deterministic Column you can
  * `repartitionByRange(...).sortWithinPartitions(...)` on before writing.
  */
object Layout {

  /** Morton-interleave two non-negative columns, `bits` bits each: bit i of
    * `x` lands at position 2i+1, bit i of `y` at 2i. Pure per-row bit
    * arithmetic (codegen'd, engine-portable — the oracle mirrors it with
    * `>> & <<` in SQL). Caller guarantees 0 ≤ value < 2^bits (pmod/clamp
    * upstream); bits ≤ 31 keeps the result in a positive long.
    */
  def zOrderKey2(x: Column, y: Column, bits: Int = 16): Column = {
    require(bits >= 1 && bits <= 31, s"bits must be in [1,31], got $bits")
    (0 until bits).flatMap { i =>
      Seq(
        shiftleft(shiftright(x.cast("long"), i).bitwiseAND(lit(1L)), 2 * i + 1),
        shiftleft(shiftright(y.cast("long"), i).bitwiseAND(lit(1L)), 2 * i))
    }.reduce(_ bitwiseOR _)
  }

  /** Inverse of [[zOrderKey2]]: (x, y) as a struct — the round-trip proof
    * the spec asserts.
    */
  def deZOrder2(z: Column, bits: Int = 16): Column = {
    require(bits >= 1 && bits <= 31, s"bits must be in [1,31], got $bits")
    def gather(offset: Int): Column =
      (0 until bits).map { i =>
        shiftleft(shiftright(z, 2 * i + offset).bitwiseAND(lit(1L)), i)
      }.reduce(_ bitwiseOR _)
    struct(gather(1).as("x"), gather(0).as("y"))
  }

  /** The DuckDB-dialect mirror of [[zOrderKey2]] over SQL expressions —
    * kept HERE so engine and oracle derive from one bit-layout definition.
    */
  def zOrderSql2(x: String, y: String, bits: Int = 16): String =
    (0 until bits).flatMap { i =>
      Seq(s"((($x >> $i) & 1) << ${2 * i + 1})", s"((($y >> $i) & 1) << ${2 * i})")
    }.mkString(" | ")

  /** Per-file min/max audit of a READ-BACK dataset: what parquet row-group
    * pruning will see. Run it after a layout change to quantify skipping
    * potential (the LayoutSpec z-order test does exactly that): tight
    * per-file ranges on a column ⇒ range predicates on it skip files.
    */
  def fileStats(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "fileStats needs at least one column")
    val aggs = cols.flatMap(c =>
      Seq(min(col(c)).as(s"min_$c"), max(col(c)).as(s"max_$c")))
    df.groupBy(input_file_name().as("file"))
      .agg(count(lit(1)).as("n_rows"), aggs: _*)
  }

  /** N-dimensional Morton interleave (generalizes [[zOrderKey2]], which is
    * the n=2 case with x first): bit i of dimension d lands at position
    * i·n + (n-1-d). n·bits ≤ 62 keeps the key a positive long.
    */
  def zOrderKeyN(cols: Seq[Column], bits: Int): Column = {
    val n = cols.size
    require(n >= 1 && bits >= 1 && n * bits <= 62,
      s"need 1 ≤ dims·bits ≤ 62, got $n dims × $bits bits")
    cols.zipWithIndex.flatMap { case (c, d) =>
      (0 until bits).map { i =>
        shiftleft(shiftright(c.cast("long"), i).bitwiseAND(lit(1L)), i * n + (n - 1 - d))
      }
    }.reduce(_ bitwiseOR _)
  }

  /** Cluster `df` for writing: range-partition by the z-key (global order
    * across output files → tight per-file min/max on BOTH dimensions),
    * then sort within partitions. `numPartitions` sizes output files.
    */
  def clusterByZOrder2(df: DataFrame, x: String, y: String, bits: Int = 16,
      numPartitions: Int = 0): DataFrame = {
    val keyed = df.withColumn("__z", zOrderKey2(col(x), col(y), bits))
    val parted =
      if (numPartitions > 0) keyed.repartitionByRange(numPartitions, col("__z"))
      else keyed.repartitionByRange(col("__z"))
    parted.sortWithinPartitions("__z").drop("__z")
  }
}
