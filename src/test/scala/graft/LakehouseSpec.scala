package graft

import java.nio.file.{Files, Path}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.ops.Lakehouse

/** ops/Lakehouse: file-level copy-on-write proof (untouched shards keep
  * their exact files), upsert idempotence, MOR reconciliation corner
  * cases (same-version tombstone tie, later-version resurrection), and
  * MOR ≡ compacted-base equivalence.
  */
class LakehouseSpec extends SparkSpec {
  import spark.implicits._

  private val Shards = 4

  private def freshPath(tag: String): String = {
    val p: Path = Files.createTempDirectory(s"graft_lakespec_$tag")
    p.toFile.deleteOnExit()
    s"$p/tbl"
  }

  /** shard-dir → sorted (file name, size) snapshot. */
  private def shardFiles(path: String): Map[String, Seq[(String, Long)]] =
    new java.io.File(path).listFiles().toSeq
      .filter(f => f.isDirectory && f.getName.startsWith(s"${Lakehouse.ShardCol}="))
      .map { d =>
        d.getName -> d.listFiles().toSeq.filterNot(_.getName.startsWith("."))
          .map(f => (f.getName, f.length)).sortBy(_._1)
      }.toMap

  private def base(n: Int): DataFrame =
    spark.range(n).select(col("id").as("k"),
      (col("id") * 10).cast("double").as("v"))

  private def upd(rows: (Long, Double, Long, Boolean)*): DataFrame =
    rows.toDF("k", "v", "_v", "_deleted")

  test("COW upsert rewrites ONLY the touched shard directories") {
    val path = freshPath("cow")
    Lakehouse.writeShardedOnce(base(1000), path, "k", Shards)
    val before = shardFiles(path)
    assert(before.size === Shards)

    // one update row → exactly one touched shard
    val touched = Lakehouse.upsertSharded(spark, path, "k", Shards,
      upd((7L, 999.0, 1L, false)), "_v", "_deleted")
    assert(touched.size === 1)
    val after = shardFiles(path)

    val touchedDir = s"${Lakehouse.ShardCol}=${touched.head}"
    assert(after(touchedDir) !== before(touchedDir), "touched shard not rewritten")
    (before.keySet - touchedDir).foreach { dir =>
      assert(after(dir) === before(dir), s"untouched $dir was rewritten")
    }

    val got = Lakehouse.readSharded(spark, path)
    assert(got.count() === 1000)
    assert(got.filter($"k" === 7).select("v").as[Double].head() === 999.0)
  }

  test("upsert applies update+insert+delete and replaying it is a no-op") {
    val path = freshPath("idem")
    Lakehouse.writeShardedOnce(base(100), path, "k", Shards)
    val batch = upd((5L, -5.0, 1L, false), (1000L, 42.0, 1L, false),
      (9L, 0.0, 1L, true))

    Lakehouse.upsertSharded(spark, path, "k", Shards, batch, "_v", "_deleted")
    def state() = Lakehouse.readSharded(spark, path)
      .orderBy("k").as[(Long, Double)].collect().toSeq
    val once = state()
    assert(once.size === 100) // 100 - 1 deleted + 1 inserted
    assert(once.contains((5L, -5.0)) && once.contains((1000L, 42.0)))
    assert(!once.exists(_._1 == 9L))

    Lakehouse.upsertSharded(spark, path, "k", Shards, batch, "_v", "_deleted")
    assert(state() === once, "replaying the same batch changed the table")
  }

  test("tombstoning EVERY key in a shard empties it — deletes are not lost") {
    val path = freshPath("allt")
    Lakehouse.writeShardedOnce(base(100), path, "k", Shards)
    // every key of one shard, all tombstoned in one batch: dynamic
    // partition overwrite writes zero rows for that shard, so without the
    // explicit directory removal the old files would survive the swap and
    // the deletes would silently un-apply on read
    val sh = spark.range(100).select(col("id").as("k"))
      .withColumn("s", Lakehouse.shardOf("k", Shards))
    val victims = sh.filter($"s" === 0).select("k").as[Long].collect().toSeq
    assert(victims.nonEmpty)
    val batch = upd(victims.map(k => (k, 0.0, 1L, true)): _*)
    Lakehouse.upsertSharded(spark, path, "k", Shards, batch, "_v", "_deleted")
    val got = Lakehouse.readSharded(spark, path)
    assert(got.count() === 100 - victims.size)
    assert(got.filter($"k".isin(victims.map(Long.box): _*)).isEmpty,
      "tombstoned keys resurfaced — the emptied shard directory survived")
    assert(!shardFiles(path).contains(s"${Lakehouse.ShardCol}=0"),
      "emptied shard directory still on disk")
    // replay converges (idempotence holds through the empty-shard path)
    Lakehouse.upsertSharded(spark, path, "k", Shards, batch, "_v", "_deleted")
    assert(Lakehouse.readSharded(spark, path).count() === 100 - victims.size)
  }

  test("MOR: tombstone wins a same-version tie; later version resurrects") {
    val b = base(10)
    val deltas = upd(
      (3L, 333.0, 1L, false), (3L, 0.0, 1L, true), // v1 tie → deleted
      (4L, 0.0, 1L, true), (4L, 444.0, 2L, false)) // v2 resurrects
    val got = Lakehouse.morView(b, deltas, "k", "_v", "_deleted")
      .orderBy("k").as[(Long, Double)].collect().toSeq
    assert(!got.exists(_._1 == 3L), "same-version tombstone must win the tie")
    assert(got.contains((4L, 444.0)), "later version must resurrect the key")
    assert(got.size === 9)
  }

  test("upsert with a new column evolves the schema; untouched shards read null") {
    val path = freshPath("evolve")
    Lakehouse.writeShardedOnce(base(100), path, "k", Shards)
    val evolved = Seq((5L, 55.0, "en", 1L, false))
      .toDF("k", "v", "lang", "_v", "_deleted")
    Lakehouse.upsertSharded(spark, path, "k", Shards, evolved, "_v", "_deleted")
    val got = Lakehouse.readSharded(spark, path)
    assert(got.columns.toSet === Set("k", "v", "lang"))
    assert(got.filter($"k" === 5).select("v", "lang")
      .as[(Double, String)].head() === ((55.0, "en")))
    // every pre-evolution row — INCLUDING those in untouched shard files
    // that predate the column — reads null via the sidecar schema
    assert(got.filter($"lang".isNull).count() === 99)
    assert(got.count() === 100)
  }

  test("asOf(v) reconstructs each historical state from the delta log") {
    val b = base(10)
    val deltas = upd(
      (3L, 33.0, 1L, false), // v1: update
      (3L, 0.0, 2L, true), // v2: delete it again
      (7L, 77.0, 2L, false)) // v2: another update
    def state(v: Long) = Lakehouse.asOf(b, deltas, "k", "_v", "_deleted", v)
      .orderBy("k").as[(Long, Double)].collect().toSeq
    assert(state(0L) === base(10).orderBy("k").as[(Long, Double)].collect().toSeq)
    assert(state(1L).contains((3L, 33.0)) && state(1L).contains((7L, 70.0)))
    assert(!state(2L).exists(_._1 == 3L) && state(2L).contains((7L, 77.0)))
  }

  test("compacted base answers exactly like the MOR view") {
    val b = base(500)
    val deltas = upd((1L, 11.0, 1L, false), (2L, 0.0, 1L, true),
      (9999L, 1.0, 1L, false))
    val view = Lakehouse.morView(b, deltas, "k", "_v", "_deleted")
    val path = freshPath("compact")
    Lakehouse.compactTo(view, path, "k", Shards)
    val compacted = Lakehouse.readSharded(spark, path)
      .orderBy("k").as[(Long, Double)].collect().toSeq
    assert(compacted === view.orderBy("k").as[(Long, Double)].collect().toSeq)
  }

  test("a changelog stream applies to the base via foreachBatch upserts") {
    // the streaming CDC-apply path: each micro-batch is one COW upsert.
    // Batch 2 updates AND deletes keys written by batch 1, so the final
    // state proves cross-batch reconciliation against the on-disk base,
    // not just within-batch merge.
    implicit val ctx = spark.sqlContext
    val path = freshPath("stream")
    Lakehouse.writeShardedOnce(base(50), path, "k", Shards)
    val in = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, Double, Long, Boolean)]
    val q = in.toDF().toDF("k", "v", "_v", "_deleted")
      .writeStream.outputMode("append")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        Lakehouse.upsertSharded(spark, path, "k", Shards, batch,
          "_v", "_deleted"); ()
      }.start()
    try {
      in.addData((100L, 1.0, 1L, false), (3L, 30.5, 1L, false))
      q.processAllAvailable()
      in.addData((100L, 2.0, 2L, false), (3L, 0.0, 2L, true))
      q.processAllAvailable()
    } finally q.stop()
    val got = Lakehouse.readSharded(spark, path)
      .orderBy("k").as[(Long, Double)].collect().toSeq
    assert(got.contains((100L, 2.0)), "batch-2 update lost")
    assert(!got.exists(_._1 == 3L), "batch-2 delete lost")
    assert(got.size === 50) // 50 base - 1 deleted + 1 inserted
  }

  test("shard routing matches Spark's bucket/repartition hash function") {
    // the promotion-to-bucketed-layout claim: pmod(hash(k), n) must be the
    // partitionIdExpression Spark's HashPartitioning uses
    val df = base(200).withColumn("s", Lakehouse.shardOf("k", Shards))
    val viaRepartition = df.repartition(Shards, col("k"))
      .withColumn("pid", spark_partition_id())
    assert(viaRepartition.filter(col("s") =!= col("pid")).count() === 0)
  }
}
