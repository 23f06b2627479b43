package graft

import org.apache.spark.sql.functions._
import graft.ops.Cdc

class CdcSpec extends SparkSpec {
  import spark.implicits._

  private val changes = Seq(
    // (key, ts, tie, payload)
    ("k1", 100L, 1L, "a"),
    ("k1", 200L, 2L, "b"),
    ("k1", 200L, 3L, "c"), // same-ts change: tie column orders it after 2
    ("k2", 50L, 4L, "x"))
    .toDF("k", "ts", "off", "v")

  test("validity intervals chain per key; last version is current") {
    val out = Cdc.scd2(changes, "k", "ts", "off")
      .select("k", "off", "valid_from", "valid_to", "is_current")
      .as[(String, Long, Long, Option[Long], Boolean)].collect().toSet
    assert(out === Set(
      ("k1", 1L, 100L, Some(200L), false),
      ("k1", 2L, 200L, Some(200L), false), // zero-length: superseded same-ts
      ("k1", 3L, 200L, None, true),
      ("k2", 4L, 50L, None, true)))
  }

  test("exactly one current row per key, intervals never overlap") {
    val rnd = new scala.util.Random(3)
    val big = Seq.tabulate(500) { i =>
      (s"k${rnd.nextInt(20)}", rnd.nextInt(1000).toLong, i.toLong, s"v$i")
    }.toDF("k", "ts", "off", "v")
    val out = Cdc.scd2(big, "k", "ts", "off")
    assert(out.filter(col("is_current")).groupBy("k").count()
      .filter(col("count") =!= 1).count() === 0)
    // within a key, sorted by (ts, off), each valid_to equals the next valid_from
    val byKey = out.select("k", "ts", "off", "valid_to")
      .as[(String, Long, Long, Option[Long])].collect()
      .groupBy(_._1).values
    byKey.foreach { rows =>
      val sorted = rows.sortBy(r => (r._2, r._3))
      sorted.sliding(2).foreach {
        case Array(a, b) => assert(a._4.contains(b._2), s"gap: $a -> $b")
        case _ =>
      }
      assert(sorted.last._4.isEmpty)
    }
  }

  test("key-partitioned window: no single-partition global sort in the plan") {
    val p = Cdc.scd2(changes, "k", "ts", "off").queryExecution.executedPlan.toString
    assert(p.contains("hashpartitioning(k"), p.take(500))
  }

  test("snapshotDiff: null-safe change detection, column order normalized") {
    import spark.implicits._
    val oldS = Seq((1L, Option("a"), Option(1.0)), (2L, None, Option(2.0)),
      (3L, Option("c"), None), (4L, Option("d"), Option(4.0)))
      .toDF("k", "s", "v")
    // col order swapped; k=2 null→"x" (changed), k=3 identical nulls
    // (unchanged), k=4 dropped, k=5 added
    val newS = Seq((1L, Option(1.0), Option("a")), (2L, Option(2.0), Option("x")),
      (3L, None: Option[Double], Option("c")), (5L, Option(5.0), Option("e")))
      .toDF("k", "v", "s")
    val d = Cdc.snapshotDiff(oldS, newS, "k").as[(Long, String)].collect().toMap
    assert(d === Map(1L -> "unchanged", 2L -> "changed", 3L -> "unchanged",
      4L -> "removed", 5L -> "added"))
    // schema mismatch fails fast
    intercept[IllegalArgumentException] {
      Cdc.snapshotDiff(oldS, newS.drop("v"), "k")
    }
  }

  test("refreshGroupStats: IVM refresh equals from-scratch re-aggregation") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // group moves (b→c for k=2), deletes (k=3 empties group d entirely),
    // inserts into a NEW group (k=10 → e), and value-only changes (k=1)
    val before = Seq((1L, "a", 10L), (2L, "b", 20L), (3L, "d", 30L),
      (4L, "a", 40L)).toDF("k", "g", "v")
    val after = Seq((1L, "a", 15L), (2L, "c", 20L), (4L, "a", 40L),
      (10L, "e", 7L)).toDF("k", "g", "v")

    val stats0 = before.groupBy(col("g"))
      .agg(count(lit(1)).as("n"), sum("v").as("s"))
    val feed = Cdc.snapshotDiffImages(before, after, "k")
      .filter(col("change") =!= "unchanged")
    val refreshed = Cdc.refreshGroupStats(stats0, feed, "g", "v")
      .orderBy("g").as[(String, Long, Long)].collect().toSeq
    val scratch = after.groupBy(col("g"))
      .agg(count(lit(1)).as("n"), sum("v").as("s"))
      .orderBy("g").as[(String, Long, Long)].collect().toSeq
    assert(refreshed === scratch)
    assert(!refreshed.exists(_._1 == "d"), "emptied group must disappear")
    assert(refreshed.exists(_._1 == "e"), "new group must appear")
  }

  test("refreshGroupStatsAt recovers from a crash between the swap renames") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val statsPath = java.nio.file.Files
      .createTempDirectory("graft_cdc_swap").toString + "/stats"
    def images(rows: (Long, String, String, Long)*) =
      rows.toDF("k", "change", "ng", "nv")
        .select(col("k"), col("change"),
          lit(null).cast("struct<g:string,v:bigint>").as("__old"),
          struct(col("ng").as("g"), col("nv").as("v")).as("__new"))
    Cdc.refreshGroupStatsAt(spark, statsPath,
      images((1L, "added", "a", 10L), (2L, "added", "b", 20L)), "g", "v")
    assert(spark.read.parquet(statsPath).count() === 2)
    // simulate the crash window: the NEXT refresh staged its output and
    // retired the live dir, then died before publishing — on disk that is
    // "no live table, a complete staging copy". Rebuild that state by
    // moving the live dir to _staging.
    val fs = new org.apache.hadoop.fs.Path(statsPath)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val staging = new org.apache.hadoop.fs.Path(statsPath + "_staging")
    fs.delete(staging, true)
    assert(fs.rename(new org.apache.hadoop.fs.Path(statsPath), staging))
    // the next refresh must base itself on the staging copy, not on empty
    Cdc.refreshGroupStatsAt(spark, statsPath,
      images((3L, "added", "a", 5L)), "g", "v")
    val got = spark.read.parquet(statsPath)
      .orderBy("g").as[(String, Long, Long)].collect().toSeq
    assert(got === Seq(("a", 2L, 15L), ("b", 1L, 20L)),
      s"staging recovery lost the pre-crash state: $got")
  }

  test("crash healing prefers the pre-batch _old copy so a retry is exact") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val statsPath = java.nio.file.Files
      .createTempDirectory("graft_cdc_old").toString + "/stats"
    def images(rows: (Long, String, String, Long)*) =
      rows.toDF("k", "change", "ng", "nv")
        .select(col("k"), col("change"),
          lit(null).cast("struct<g:string,v:bigint>").as("__old"),
          struct(col("ng").as("g"), col("nv").as("v")).as("__new"))
    val hp = (s: String) => new org.apache.hadoop.fs.Path(s)
    val fs = hp(statsPath).getFileSystem(spark.sparkContext.hadoopConfiguration)
    // assemble the mid-swap crash window from two scratch tables (calling
    // refreshGroupStatsAt on the target in between would self-heal):
    // _old = pre-batch (a,1,10), _staging = post-batch (a,2,15), no live
    val pre = statsPath + "_prebuild"
    Cdc.refreshGroupStatsAt(spark, pre, images((1L, "added", "a", 10L)), "g", "v")
    val post = statsPath + "_postbuild"
    Cdc.refreshGroupStatsAt(spark, post, images((1L, "added", "a", 10L)), "g", "v")
    Cdc.refreshGroupStatsAt(spark, post, images((2L, "added", "a", 5L)), "g", "v")
    assert(fs.rename(hp(pre), hp(statsPath + "_old")))
    assert(fs.rename(hp(post), hp(statsPath + "_staging")))
    // the caller's RETRY of batch 1 (its call never returned) must apply
    // the diff exactly once — on the recovered _old base, not on _staging
    // (which already contains it)
    Cdc.refreshGroupStatsAt(spark, statsPath, images((2L, "added", "a", 5L)), "g", "v")
    val got = spark.read.parquet(statsPath)
      .orderBy("g").as[(String, Long, Long)].collect().toSeq
    assert(got === Seq(("a", 2L, 15L)),
      s"retry after mid-swap crash must not double-apply: $got")
  }

  test("a batchId replay against the published table is a no-op") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val statsPath = java.nio.file.Files
      .createTempDirectory("graft_cdc_replay").toString + "/stats"
    def images(rows: (Long, String, String, Long)*) =
      rows.toDF("k", "change", "ng", "nv")
        .select(col("k"), col("change"),
          lit(null).cast("struct<g:string,v:bigint>").as("__old"),
          struct(col("ng").as("g"), col("nv").as("v")).as("__new"))
    Cdc.refreshGroupStatsAt(spark, statsPath,
      images((1L, "added", "a", 10L)), "g", "v", batchId = Some(0L))
    // the post-publish-pre-checkpoint-commit crash: the table already
    // carries batch 1, the stream replays batch 1 on restart
    Cdc.refreshGroupStatsAt(spark, statsPath,
      images((2L, "added", "a", 5L)), "g", "v", batchId = Some(1L))
    Cdc.refreshGroupStatsAt(spark, statsPath,
      images((2L, "added", "a", 5L)), "g", "v", batchId = Some(1L))
    val got = spark.read.parquet(statsPath)
      .orderBy("g").as[(String, Long, Long)].collect().toSeq
    assert(got === Seq(("a", 2L, 15L)), s"replayed batch must be skipped: $got")
    // a NEW batch id still applies
    Cdc.refreshGroupStatsAt(spark, statsPath,
      images((3L, "added", "b", 7L)), "g", "v", batchId = Some(2L))
    val got2 = spark.read.parquet(statsPath)
      .orderBy("g").as[(String, Long, Long)].collect().toSeq
    assert(got2 === Seq(("a", 2L, 15L), ("b", 1L, 7L)))
  }

  test("snapshotDiffImages carries old/new images; unchanged rows are inert") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val before = Seq((1L, "x", 1L), (2L, "y", 2L)).toDF("k", "g", "v")
    val diff = Cdc.snapshotDiffImages(before, before, "k")
    assert(diff.filter(col("change") =!= "unchanged").count() === 0)
    // an all-unchanged feed refreshes to identical stats even UNFILTERED
    val stats0 = before.groupBy(col("g")).agg(count(lit(1)).as("n"), sum("v").as("s"))
    val refreshed = Cdc.refreshGroupStats(stats0, diff, "g", "v")
      .orderBy("g").as[(String, Long, Long)].collect().toSeq
    assert(refreshed === stats0.orderBy("g").as[(String, Long, Long)].collect().toSeq)
  }
}
