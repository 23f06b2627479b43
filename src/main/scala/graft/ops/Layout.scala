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

  /** Hilbert-curve index of a non-negative (x, y) cell, `bits` bits per
    * dimension — the layout key with strictly better locality than Morton:
    * consecutive indices are ALWAYS 4-adjacent cells (|Δx|+|Δy| = 1, no
    * Morton "jumps" across the plane), so a sorted run's bounding box is
    * tighter and parquet min/max pruning skips more files on both columns.
    *
    * The classic per-level fold (Wikipedia "Hilbert curve", public domain
    * formulation: consume one bit of each coordinate per level, accumulate
    * the quadrant index, rotate/reflect the frame) is inherently sequential
    * in (x, y, d) — inlining it as one Column would duplicate the (x, y)
    * subtrees ~4× per level, an exponential expression tree. So the loop is
    * staged through REAL projections (one per level, same
    * CollapseProject-resistant shape as the tokenizer staging in
    * Dedup.scala): 3 narrow integer columns per level, all codegen'd, no
    * shuffle. [[hilbertSql2]] generates the identical chain as DuckDB CTEs
    * so the oracle reproduces every bit.
    *
    * Caller guarantees 0 ≤ x, y < 2^bits (pmod/clamp upstream);
    * 2·bits ≤ 62 keeps the index a positive long.
    */
  def withHilbertKey2(df: DataFrame, x: Column, y: Column, bits: Int,
      out: String): DataFrame = {
    require(bits >= 1 && bits <= 31, s"bits must be in [1,31], got $bits")
    val n = 1L << bits
    val seeded = df
      .withColumn("__hx_0", x.cast("long"))
      .withColumn("__hy_0", y.cast("long"))
      .withColumn("__hd_0", lit(0L))
    val folded = (bits - 1 to 0 by -1).zipWithIndex.foldLeft(seeded) {
      case (acc, (level, step)) =>
        val s = 1L << level
        val px = col(s"__hx_$step"); val py = col(s"__hy_$step")
        val rx = shiftright(px, level).bitwiseAND(lit(1L))
        val ry = shiftright(py, level).bitwiseAND(lit(1L))
        acc
          .withColumn(s"__hd_${step + 1}",
            col(s"__hd_$step") + lit(s * s) * (lit(3L) * rx).bitwiseXOR(ry))
          // rotate/reflect for the next level: ry=0 → (flip if rx=1, then
          // swap); ry=1 → unchanged. Flips are over the FULL n-wide frame
          // (higher bits are already consumed, each level masks its own).
          .withColumn(s"__hx_${step + 1}",
            when(ry === 0, when(rx === 1, lit(n - 1) - py).otherwise(py)).otherwise(px))
          .withColumn(s"__hy_${step + 1}",
            when(ry === 0, when(rx === 1, lit(n - 1) - px).otherwise(px)).otherwise(py))
    }
    folded.withColumn(out, col(s"__hd_$bits"))
      .drop((0 to bits).flatMap(i => Seq(s"__hx_$i", s"__hy_$i", s"__hd_$i")): _*)
  }

  /** Inverse of [[withHilbertKey2]]: decode index `d` back to (outX, outY)
    * — the round-trip proof the spec asserts. Same staged-projection shape,
    * levels bottom-up, rotations over the CURRENT s-wide frame.
    */
  def withHilbertXY2(df: DataFrame, d: Column, bits: Int,
      outX: String, outY: String): DataFrame = {
    require(bits >= 1 && bits <= 31, s"bits must be in [1,31], got $bits")
    val seeded = df
      .withColumn("__gx_0", lit(0L)).withColumn("__gy_0", lit(0L))
      .withColumn("__gt_0", d.cast("long"))
    val folded = (0 until bits).foldLeft(seeded) { (acc, step) =>
      val s = 1L << step
      val px = col(s"__gx_$step"); val py = col(s"__gy_$step")
      val t = col(s"__gt_$step")
      val rx = shiftright(t, 1).bitwiseAND(lit(1L))
      val ry = t.bitwiseXOR(rx).bitwiseAND(lit(1L))
      val fx = when(ry === 0, when(rx === 1, lit(s - 1) - py).otherwise(py)).otherwise(px)
      val fy = when(ry === 0, when(rx === 1, lit(s - 1) - px).otherwise(px)).otherwise(py)
      acc
        .withColumn(s"__gx_${step + 1}", fx + lit(s) * rx)
        .withColumn(s"__gy_${step + 1}", fy + lit(s) * ry)
        .withColumn(s"__gt_${step + 1}", shiftright(t, 2))
    }
    folded
      .withColumn(outX, col(s"__gx_$bits")).withColumn(outY, col(s"__gy_$bits"))
      .drop((0 to bits).flatMap(i => Seq(s"__gx_$i", s"__gy_$i", s"__gt_$i")): _*)
  }

  /** DuckDB mirror of [[withHilbertKey2]] — generates the identical staged
    * fold as chained CTEs from the SAME level/flip/quadrant definitions, so
    * engine and oracle share one bit-layout source of truth. Returns a full
    * query: `keep` columns are carried through; the index lands as `outCol`.
    */
  def hilbertSql2(table: String, keep: Seq[String], x: String, y: String,
      bits: Int, outCol: String): String = {
    require(bits >= 1 && bits <= 31, s"bits must be in [1,31], got $bits")
    val n = 1L << bits
    val carry = keep.mkString(", ")
    val seed =
      s"hh0 AS (SELECT $carry, ($x)::BIGINT AS hx, ($y)::BIGINT AS hy, 0::BIGINT AS hd FROM $table)"
    val levels = (bits - 1 to 0 by -1).zipWithIndex.map { case (level, step) =>
      val s = 1L << level
      val rx = s"((hx >> $level) & 1)"
      val ry = s"((hy >> $level) & 1)"
      s"""hh${step + 1} AS (SELECT $carry,
         |  CASE WHEN $ry = 0 THEN CASE WHEN $rx = 1 THEN ${n - 1} - hy ELSE hy END ELSE hx END AS hx,
         |  CASE WHEN $ry = 0 THEN CASE WHEN $rx = 1 THEN ${n - 1} - hx ELSE hx END ELSE hy END AS hy,
         |  hd + ${s * s} * xor(3 * $rx, $ry) AS hd
         |FROM hh$step)""".stripMargin
    }
    s"""WITH $seed,
       |${levels.mkString(",\n")}
       |SELECT $carry, hd AS $outCol FROM hh$bits""".stripMargin
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

  /** [[clusterByZOrder2]]'s Hilbert twin — same write-side lever, tighter
    * per-file bounding boxes (LayoutSpec quantifies the win on both).
    */
  def clusterByHilbert2(df: DataFrame, x: String, y: String, bits: Int = 16,
      numPartitions: Int = 0): DataFrame = {
    val keyed = withHilbertKey2(df, col(x), col(y), bits, "__h")
    val parted =
      if (numPartitions > 0) keyed.repartitionByRange(numPartitions, col("__h"))
      else keyed.repartitionByRange(col("__h"))
    parted.sortWithinPartitions("__h").drop("__h")
  }
}
