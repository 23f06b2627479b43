package graft.tools

import org.apache.spark.sql.SparkSession

/** Dump `.explain("formatted")` for named queries to files — the r21
  * optimization-round evidence trail (plans/r21/<query>_<tag>.txt).
  *
  * Usage: runMain graft.tools.PlanSnap <outDir> <tag> <query> [query...]
  */
object PlanSnap {
  def main(args: Array[String]): Unit = {
    require(args.length >= 3, "usage: PlanSnap <outDir> <tag> <query>...")
    val (outDir, tag, names) = (args(0), args(1), args.drop(2).toSeq)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.Tables.configure(spark)
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    names.foreach { q =>
      val plan = graft.SparkEntry.queries(q)(spark, sfDir).queryExecution
        .explainString(org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      val ex = plan.linesIterator.count(_.trim.startsWith("Arguments: hashpartitioning("))
      val header = s"== $q @ $sfDir ($tag) ==\n" +
        s"(shuffle exchanges in final-plan text: $ex — lifecycle queries " +
        "run MULTIPLE jobs; this is the returned frame's plan only)\n\n"
      java.nio.file.Files.write(
        java.nio.file.Paths.get(s"$outDir/${q}_$tag.txt"),
        (header + plan).getBytes("UTF-8"))
      println(s"PLANSNAP wrote $outDir/${q}_$tag.txt exchanges=$ex")
    }
    spark.stop()
  }
}
