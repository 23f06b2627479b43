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

  test("every registered query executes on zero-row tables") {
    val failures = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      try { fn(spark, emptyDir).collect(); None }
      catch { case e: Throwable =>
        Some(name -> Option(e.getMessage).getOrElse(e.getClass.getName).take(160)) }
    }
    assert(failures.isEmpty,
      s"${failures.size} queries fail on empty input:\n" +
        failures.map { case (n, m) => s"  $n: $m" }.mkString("\n"))
  }
}
