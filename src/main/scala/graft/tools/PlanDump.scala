package graft.tools

import org.apache.spark.sql.SparkSession

/** Ad-hoc: print shuffle-exchange counts + join kinds for named queries. */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    args.foreach { q =>
      val p = graft.SparkEntry.queries(q)(spark, dir).queryExecution
        .explainString(org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      val ex = p.linesIterator.count(_.trim.startsWith("Arguments: hashpartitioning("))
      val bhj = p.linesIterator.count(_.contains("BroadcastHashJoin"))
      val smj = p.linesIterator.count(_.contains("SortMergeJoin"))
      val bnlj = p.linesIterator.count(_.contains("BroadcastNestedLoopJoin"))
      val cart = p.linesIterator.count(_.contains("CartesianProduct"))
      println(s"PLANDUMP $q exchanges=$ex bhj=$bhj smj=$smj bnlj=$bnlj cartesian=$cart")
    }
    spark.stop()
  }
}
