package graft.tools

import org.apache.spark.sql.SparkSession
import graft.{SparkEntry, Tables}

/** Dev tool: time an arbitrary subset of SparkEntry.queries against any sf
  * dir (best-of-N wall clock per query, all runs disclosed) — the scale
  * audits' measurement harness, so per-op sf0.1 → perturbed-sf1 numbers
  * don't require a full Bench board pass.
  *
  * Usage: SPARK_GRAFT_SF_DIR=<dir> [SPARK_GRAFT_BENCH_REPS=2]
  *        runMain graft.tools.TimeQueries <query> [query...]
  */
object TimeQueries {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "pass at least one query name")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val reps = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "2").toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Tables.configure(spark)
    val results = args.toSeq.map { name =>
      val runs = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        val n = SparkEntry.queries(name)(spark, sfDir).count()
        ((System.nanoTime() - t0) / 1e9, n)
      }
      (name, runs.map(_._1).min, runs.head._2, runs.map(_._1))
    }
    results.foreach { case (name, best, rows, runs) =>
      println(f"""{"query":"$name","best_sec":$best%.2f,"rows":$rows,"runs":[${
        runs.map(r => f"$r%.2f").mkString(",")}]}""")
    }
    spark.stop()
  }
}
