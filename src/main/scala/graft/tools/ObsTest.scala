package graft.tools
import org.apache.spark.sql.{SparkSession, Observation}
import org.apache.spark.sql.functions._

/** Dev probe (r22): pins that an eager `localCheckpoint` action COMPLETES
  * an [[Observation]] attached below it — the contract
  * [[graft.ops.Graph]]'s fused convergence probes rely on (the probe
  * metric rides the round's materialization job instead of a separate
  * per-round action). If a Spark upgrade ever stops routing
  * localCheckpoint through a SQL-tracked action, this main times out
  * after 10 s instead of printing OBS — run it before trusting the fused
  * path on a new version.
  */
object ObsTest {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val obs = Observation("cnt")
    val df = spark.range(1000).toDF("x").observe(obs, count(lit(1)).as("n"))
    val ck = df.localCheckpoint(true)
    // does the observation complete from the checkpoint action alone?
    val t0 = System.nanoTime()
    val r = scala.concurrent.Await.result(
      scala.concurrent.Future(obs.get)(scala.concurrent.ExecutionContext.global),
      scala.concurrent.duration.Duration(10, "sec"))
    println(s"OBS result=$r in ${(System.nanoTime()-t0)/1e6} ms, ck rows=${ck.count()}")
    spark.stop()
  }
}
