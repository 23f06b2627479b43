package graft

/** Empty-input robustness: every registered query must plan AND execute
  * against zero-row tables (a fresh ingest, a filter that matched nothing,
  * a partition with no data yet). At 100 TB someone always gets the empty
  * slice; an operator that throws on it takes the whole job down.
  */
class EmptyInputSpec extends SparkSpec {

  /** Zero-row mirror of the testdata, schemas preserved (events keeps its
    * nanos-long ts via the same nanosAsLong read the loaders use).
    */
  private lazy val emptyDir: String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_empty").toString
    Tables.configure(spark)
    Tables.names.foreach { t =>
      spark.read.parquet(s"${sf()}/$t.parquet").limit(0)
        .write.mode("overwrite").parquet(s"$dir/$t.parquet")
    }
    dir
  }

  /** Per-query wall-clock budget (seconds) via [[Budget]]. Non-termination
    * is a failure mode, not just exceptions: round 11's mm_image planning
    * hang wedged this suite (and with it `sbt test`) for 8+ minutes before
    * timeout. A budget breach fails THAT query loudly while the rest of
    * the board completes. Generous because empty input still pays
    * cold-JIT planning on the first few queries.
    */
  private val budgetSec =
    sys.env.get("SPARK_GRAFT_EMPTY_TIMEOUT_SEC").map(_.toInt).getOrElse(120)

  test("every registered query executes on zero-row tables") {
    val failures = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      Budget.run(spark.sparkContext, name, budgetSec) {
        fn(spark, emptyDir).collect(): Unit
      }.map(name -> _)
    }
    assert(failures.isEmpty,
      s"${failures.size} queries fail on empty input:\n" +
        failures.map { case (n, m) => s"  $n: $m" }.mkString("\n"))
  }
}
