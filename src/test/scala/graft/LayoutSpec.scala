package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._

/** Storage-layout scale techniques, proven against the physical plan:
  * partition pruning (a filtered scan touches only the matching partition
  * directories) and bucketed co-located joins (pre-bucketed tables join
  * with NO shuffle exchange). These are the two layout levers a 100 TB
  * deployment leans on hardest; the specs pin that the plans actually use
  * them, not just that the API accepts them.
  */
class LayoutSpec extends SparkSpec {
  import spark.implicits._

  private def explain(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))

  test("partitioned parquet: filters prune at the partition level, not per-row") {
    val dir = Files.createTempDirectory("graft_part").toString
    Seq((1L, "click", 1.0), (2L, "view", 2.0), (3L, "click", 3.0), (4L, "buy", 4.0))
      .toDF("event_id", "event_type", "value")
      .write.mode("overwrite").partitionBy("event_type").parquet(dir)
    val read = spark.read.parquet(dir).filter(col("event_type") === "click")
    val p = explain(read)
    // the predicate must appear as a PARTITION filter (directory pruning),
    // not a data filter evaluated per row post-scan
    // attribute names carry expr ids in formatted plans: event_type#19 = click
    assert(p.contains("PartitionFilters") && p.contains("= click)"), p.take(800))
    assert(read.count() === 2)
    // pruned scan reads only the matching directory's files
    val scanned = read.select(input_file_name()).distinct().as[String].collect()
    assert(scanned.forall(_.contains("event_type=click")), scanned.mkString(", "))
  }

  test("bucketed tables join with no shuffle exchange on either side") {
    val prevBroadcast = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      spark.sql("DROP TABLE IF EXISTS graft_buck_a")
      spark.sql("DROP TABLE IF EXISTS graft_buck_b")
      (1L to 100L).map(i => (i % 10, i)).toDF("k", "a")
        .write.mode("overwrite").bucketBy(4, "k").sortBy("k").saveAsTable("graft_buck_a")
      (1L to 40L).map(i => (i % 10, i * 2)).toDF("k", "b")
        .write.mode("overwrite").bucketBy(4, "k").sortBy("k").saveAsTable("graft_buck_b")
      val j = spark.table("graft_buck_a").join(spark.table("graft_buck_b"), "k")
      val p = explain(j)
      assert(!p.contains("Exchange"),
        s"bucketed join should be co-located, plan has an exchange:\n${p.take(800)}")
      assert(j.count() === 100L * 4) // each of 100 rows matches 4 of the 40
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevBroadcast)
      spark.sql("DROP TABLE IF EXISTS graft_buck_a")
      spark.sql("DROP TABLE IF EXISTS graft_buck_b")
    }
  }

  test("z-order key round-trips and interleaves bit-exactly") {
    val pts = Seq((0L, 0L), (1L, 0L), (0L, 1L), (4095L, 4095L), (2748L, 1039L),
      (1L, 4095L), (4095L, 1L))
    val df = pts.toDF("x", "y")
    val back = df.select(col("x"), col("y"),
        graft.ops.Layout.deZOrder2(
          graft.ops.Layout.zOrderKey2(col("x"), col("y"), 12), 12).as("d"))
      .select(col("x"), col("y"), col("d.x").as("rx"), col("d.y").as("ry"))
      .as[(Long, Long, Long, Long)].collect()
    back.foreach { case (x, y, rx, ry) => assert(rx === x && ry === y, s"($x,$y)") }
    // known value: x=1,y=0 → bit0 of x at position 1 → z=2; x=0,y=1 → z=1
    val z = df.select(graft.ops.Layout.zOrderKey2(col("x"), col("y"), 12))
      .as[Long].collect()
    assert(z(1) === 2L && z(2) === 1L && z(0) === 0L)
  }

  test("fileStats: z-clustered parquet writes carry tight per-file ranges") {
    val n = 64
    val grid = (for (x <- 0 until n; y <- 0 until n) yield (x.toLong, y.toLong))
      .toDF("x", "y")
    val dir = Files.createTempDirectory("graft_zwrite").toString
    graft.ops.Layout.clusterByZOrder2(grid, "x", "y", bits = 6, numPartitions = 16)
      .write.mode("overwrite").parquet(dir)
    val stats = graft.ops.Layout.fileStats(spark.read.parquet(dir), Seq("x", "y"))
      .select(col("n_rows"), col("max_x") - col("min_x"), col("max_y") - col("min_y"))
      .as[(Long, Long, Long)].collect()
    assert(stats.length === 16)
    // 16×16 z-tiles: every file spans at most 16 in each dimension — a
    // range predicate on x OR y can skip 3/4 of the files
    stats.foreach { case (rows, xw, yw) =>
      assert(rows === 256L && xw <= 15L && yw <= 15L, s"($rows, $xw, $yw)") }
  }

  test("N-dim z-order: bijective on the grid, agrees with the 2-dim case") {
    val grid3 = (for (x <- 0 until 16; y <- 0 until 16; z <- 0 until 16)
      yield (x.toLong, y.toLong, z.toLong)).toDF("x", "y", "z")
    val keys = grid3.select(graft.ops.Layout.zOrderKeyN(
      Seq(col("x"), col("y"), col("z")), bits = 4).as("zk"))
    assert(keys.distinct().count() === 4096L)
    assert(keys.agg(max("zk")).as[Long].head() === 4095L)
    // n=2 specialization matches zOrderKey2 bit-for-bit
    val pts = Seq((7L, 11L), (0L, 4095L), (2748L, 1039L)).toDF("x", "y")
    val both = pts.select(
      graft.ops.Layout.zOrderKey2(col("x"), col("y"), 12).as("a"),
      graft.ops.Layout.zOrderKeyN(Seq(col("x"), col("y")), 12).as("b"))
      .as[(Long, Long)].collect()
    both.foreach { case (a, b) => assert(a === b) }
  }

  test("hilbert key: bijective, round-trips, and consecutive keys are adjacent cells") {
    val k = 5 // full 32×32 grid
    val grid = (for (x <- 0 until 32; y <- 0 until 32) yield (x.toLong, y.toLong))
      .toDF("x", "y")
    val keyed = graft.ops.Layout.withHilbertKey2(grid, col("x"), col("y"), k, "h")
    // bijection onto [0, 1024)
    val hs = keyed.select("h").as[Long].collect()
    assert(hs.distinct.length === 1024 && hs.min === 0L && hs.max === 1023L)
    // THE Hilbert property (and what Morton lacks): walking the key order
    // steps one cell at a time — every sorted-run bounding box grows as
    // slowly as geometrically possible
    val walk = keyed.select("h", "x", "y").as[(Long, Long, Long)].collect()
      .sortBy(_._1)
    walk.sliding(2).foreach { case Array((_, x0, y0), (_, x1, y1)) =>
      assert(math.abs(x1 - x0) + math.abs(y1 - y0) === 1L,
        s"jump between ($x0,$y0) and ($x1,$y1)")
    }
    // decode inverts encode on every cell
    val back = graft.ops.Layout.withHilbertXY2(
        keyed.select(col("x").as("ox"), col("y").as("oy"), col("h")),
        col("h"), k, "dx", "dy")
      .select("ox", "oy", "dx", "dy").as[(Long, Long, Long, Long)].collect()
    back.foreach { case (ox, oy, dx, dy) => assert(dx === ox && dy === oy, s"($ox,$oy)") }
  }

  test("hilbert clustering: per-partition boxes at least as tight as z-order") {
    val n = 64
    val grid = (for (x <- 0 until n; y <- 0 until n) yield (x.toLong, y.toLong))
      .toDF("x", "y")
    def totalBBoxPerimeter(df: org.apache.spark.sql.DataFrame): Double =
      df.groupBy(spark_partition_id().as("pid"))
        .agg(min("x").as("x0"), max("x").as("x1"), min("y").as("y0"), max("y").as("y1"))
        .select((col("x1") - col("x0") + 1) + (col("y1") - col("y0") + 1))
        .as[Long].collect().map(_.toDouble).sum
    val h = totalBBoxPerimeter(
      graft.ops.Layout.clusterByHilbert2(grid, "x", "y", bits = 6, numPartitions = 16))
    val z = totalBBoxPerimeter(
      graft.ops.Layout.clusterByZOrder2(grid, "x", "y", bits = 6, numPartitions = 16))
    val xOnly = totalBBoxPerimeter(grid.repartitionByRange(16, col("x")))
    assert(h <= z, s"hilbert=$h zorder=$z")
    assert(h < xOnly * 0.6, s"hilbert=$h xsorted=$xOnly")
  }

  test("z-order clustering shrinks per-partition bounding boxes on BOTH dims") {
    // uniform 2-d grid; compare range-partitioning by zkey vs by x alone
    val n = 64
    val grid = (for (x <- 0 until n; y <- 0 until n) yield (x.toLong, y.toLong))
      .toDF("x", "y")
    // the pruning-relevant metric is the boxes' PERIMETER, not area (tiles
    // tile the plane either way): a random range box intersects a partition
    // with probability ∝ its extent per dimension. x-sorted: 4×64 slabs
    // (half-perimeter 68); z-clustered: 16×16 tiles (half-perimeter 32)
    def totalBBoxPerimeter(df: org.apache.spark.sql.DataFrame): Double = {
      val parts = df.groupBy(spark_partition_id().as("pid"))
        .agg(min("x").as("x0"), max("x").as("x1"), min("y").as("y0"), max("y").as("y1"))
        .select((col("x1") - col("x0") + 1) + (col("y1") - col("y0") + 1))
        .as[Long].collect()
      parts.map(_.toDouble).sum
    }
    val zClustered = graft.ops.Layout.clusterByZOrder2(grid, "x", "y", bits = 6,
      numPartitions = 16)
    val xSorted = grid.repartitionByRange(16, col("x"))
    val zPerim = totalBBoxPerimeter(zClustered)
    val xPerim = totalBBoxPerimeter(xSorted)
    assert(zPerim < xPerim * 0.6, s"z=$zPerim x=$xPerim")
    // and a 2-d range predicate touches fewer z-partitions than x-partitions
    def touched(df: org.apache.spark.sql.DataFrame): Long = {
      val withPid = df.select(col("x"), col("y"), spark_partition_id().as("pid"))
      val boxes = withPid.groupBy("pid")
        .agg(min("x").as("x0"), max("x").as("x1"), min("y").as("y0"), max("y").as("y1"))
      boxes.filter(col("x1") >= 8 && col("x0") <= 15 && col("y1") >= 8 && col("y0") <= 15)
        .count()
    }
    assert(touched(zClustered) <= touched(xSorted),
      "z layout should never touch more partitions for a 2-d box predicate")
  }
}
