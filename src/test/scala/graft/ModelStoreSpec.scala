package graft

import org.apache.spark.sql.SparkSession

import graft.ops.ModelStore

/** The shared rename-as-commit model store ([[graft.ops.ModelStore]]) —
  * the protocol is spec'd once here, directly; its adopters (Dsir, Ivf,
  * Pca, Classifier) pin their own table shapes and validation on top.
  */
class ModelStoreSpec extends SparkSpec {
  import spark.implicits._

  private def fs = new org.apache.hadoop.fs.Path("/tmp")
    .getFileSystem(spark.sparkContext.hadoopConfiguration)
  private def hp(s: String) = new org.apache.hadoop.fs.Path(s)

  private def publishOne(dir: String, v: Int,
      beforeCommit: () => Unit = () => ()): Unit =
    ModelStore.publish(spark, dir, "spec model", legacyNames = Seq("t"),
        beforeCommit = beforeCommit) { staging =>
      Seq((v, s"payload$v")).toDF("v", "s").coalesce(1).write.parquet(s"$staging/t")
    }

  private def readOne(dir: String): Int =
    ModelStore.read(spark, dir, "spec model",
      isLegacy = ns => ns.contains("t"))(cur =>
      spark.read.parquet(s"$cur/t").head().getInt(0))

  test("publish → read round-trip; republish supersedes; tokens + current only") {
    val dir = "/tmp/graft_modelstore_spec_rt"
    fs.delete(hp(dir), true)
    publishOne(dir, 1)
    assert(readOne(dir) === 1)
    val g1 = ModelStore.generation(spark, dir)
    publishOne(dir, 2)
    assert(readOne(dir) === 2)
    assert(ModelStore.generation(spark, dir) !== g1,
      "every publish must move the generation")
    val names = fs.listStatus(hp(dir)).map(_.getPath.getName).toSet
    assert(names === Set("current", "_graft_pubclaim", "_graft_pubgen"),
      s"debris: $names")
  }

  test("a crash between the two commit renames refuses loudly, naming the intact " +
      "prev copy; the next publish heals") {
    val dir = "/tmp/graft_modelstore_spec_crash"
    fs.delete(hp(dir), true)
    publishOne(dir, 1)
    assert(fs.rename(hp(s"$dir/current"), hp(s"$dir/_graft_prev_forged")))
    val e = intercept[IllegalStateException](readOne(dir))
    assert(e.getMessage.contains("crashed mid-publish") &&
      e.getMessage.contains("_graft_prev_forged"))
    publishOne(dir, 2)
    assert(readOne(dir) === 2)
    assert(!fs.exists(hp(s"$dir/_graft_prev_forged")),
      "a successful publish clears superseded prev debris")
  }

  test("a pre-atomic flat layout refuses with a re-save pointer; absent refuses " +
      "plainly") {
    val dir = "/tmp/graft_modelstore_spec_legacy"
    fs.delete(hp(dir), true)
    Seq((9, "legacy")).toDF("v", "s").write.parquet(s"$dir/t")
    val e = intercept[IllegalStateException](readOne(dir))
    assert(e.getMessage.contains("pre-atomic unversioned layout") &&
      e.getMessage.contains("re-save"))
    // re-save adopts the layout AND clears the flat table (legacyNames)
    publishOne(dir, 3)
    assert(readOne(dir) === 3)
    assert(!fs.exists(hp(s"$dir/t")), "legacy flat table must be cleared post-commit")
    val none = "/tmp/graft_modelstore_spec_absent"
    fs.delete(hp(none), true)
    val e2 = intercept[IllegalStateException](readOne(none))
    assert(e2.getMessage.contains("save one first"))
  }

  test("crashed-publish staging debris is healed by the next publish — which " +
      "claims FIRST, so a heal can never race a live publisher into a partial " +
      "commit (the loser refuses at its re-check)") {
    val dir = "/tmp/graft_modelstore_spec_debris"
    fs.delete(hp(dir), true)
    publishOne(dir, 1)
    fs.mkdirs(hp(s"$dir/_graft_staging_deadcafe"))
    publishOne(dir, 2)
    assert(readOne(dir) === 2)
    val names = fs.listStatus(hp(dir)).map(_.getPath.getName).toSet
    assert(!names.exists(_.startsWith("_graft_staging_")),
      s"debris survived the heal: $names")
  }

  test("single-publisher: a competing publish mid-save makes the loser refuse " +
      "loudly; the winner is complete; no staging leaks") {
    val dir = "/tmp/graft_modelstore_spec_concurrent"
    fs.delete(hp(dir), true)
    publishOne(dir, 1)
    val e = intercept[java.util.ConcurrentModificationException] {
      publishOne(dir, 2, beforeCommit = () => publishOne(dir, 3))
    }
    assert(e.getMessage.contains("concurrent spec model publish"))
    assert(readOne(dir) === 3)
    val names = fs.listStatus(hp(dir)).map(_.getPath.getName).toSet
    assert(!names.exists(_.startsWith("_graft_staging_")), s"staging leaked: $names")
  }

  test("a STABLE corrupt model (table missing inside a committed current/) " +
      "refuses on the FIRST attempt — missing-file retries are reserved for " +
      "the mid-commit window (r20, the ProbeRetry narrowing one level up)") {
    val dir = "/tmp/graft_modelstore_spec_corrupt"
    fs.delete(hp(dir), true)
    publishOne(dir, 1)
    // forge the corruption: the committed table vanishes, current/ stays
    fs.delete(hp(s"$dir/current/t"), true)
    var attempts = 0
    val e = intercept[Exception] {
      ModelStore.read(spark, dir, "spec model") { cur =>
        attempts += 1
        spark.read.parquet(s"$cur/t").head().getInt(0)
      }
    }
    assert(attempts === 1, s"stable corruption was retried: $attempts attempts")
    assert(Iterator.iterate(e: Throwable)(_.getCause).takeWhile(_ != null)
      .exists(c => Option(c.getMessage).exists(m =>
        m.contains("Path does not exist") || m.contains("PATH_NOT_FOUND"))),
      s"unexpected failure shape: $e")
  }

  test("a read whose table fetches straddle a publish retries and serves ONE " +
      "model — the generation re-check, not luck") {
    val dir = "/tmp/graft_modelstore_spec_readrace"
    fs.delete(hp(dir), true)
    publishOne(dir, 1)
    // two-table model read where a full publish lands between the reads
    ModelStore.publish(spark, dir, "spec model") { staging =>
      Seq(Tuple1(10)).toDF("a").coalesce(1).write.parquet(s"$staging/t1")
      Seq(Tuple1(10)).toDF("b").coalesce(1).write.parquet(s"$staging/t2")
    }
    def publishPair(v: Int): Unit =
      ModelStore.publish(spark, dir, "spec model") { staging =>
        Seq(Tuple1(v)).toDF("a").coalesce(1).write.parquet(s"$staging/t1")
        Seq(Tuple1(v)).toDF("b").coalesce(1).write.parquet(s"$staging/t2")
      }
    val fired = new java.util.concurrent.atomic.AtomicBoolean(false)
    val (a, b) = ModelStore.read(spark, dir, "spec model") { cur =>
      val a = spark.read.parquet(s"$cur/t1").head().getInt(0)
      if (fired.compareAndSet(false, true)) publishPair(20)
      val b = spark.read.parquet(s"$cur/t2").head().getInt(0)
      (a, b)
    }
    assert(a === b, s"mixed-model read served: t1=$a t2=$b")
    assert(a === 20, "the retry reads the committed (new) model")
  }
}
