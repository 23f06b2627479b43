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
      // noop sink, NOT count(): count lets Catalyst prune every projection
      // and row-preserving join out of the plan — a projection-shaped
      // query (a hash column, a scoring pass, an SCD2 window) then
      // measures as little more than the scan (observed: a 6.5 s query
      // reporting 0.45 s). Same evaluation discipline as Bench. The row
      // count is taken once, untimed, for the report only.
      val runs = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        SparkEntry.queries(name)(spark, sfDir)
          .write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      val n = SparkEntry.queries(name)(spark, sfDir).count()
      (name, runs.min, n, runs)
    }
    results.foreach { case (name, best, rows, runs) =>
      println(f"""{"query":"$name","best_sec":$best%.2f,"rows":$rows,"runs":[${
        runs.map(r => f"$r%.2f").mkString(",")}]}""")
    }
    spark.stop()
  }
}
