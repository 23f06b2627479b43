package graft.tools

import scala.collection.concurrent.TrieMap

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession
import graft.{SparkEntry, Tables}

/** Dev tool: run one declared query and print per-STAGE task-skew stats —
  * task count, total/max/median task time, and the stage's name line — so a
  * single-task straggler (the dedup_cc_kept 100× flag, SCALE.md batch-4)
  * can be located without the UI. A stage whose max-task time ≈ its total
  * while sibling tasks are idle IS the straggler.
  *
  * Usage: SPARK_GRAFT_SF_DIR=<dir> runMain graft.tools.TaskAudit <query>
  */
object TaskAudit {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "pass one query name")
    val name = args.head
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Tables.configure(spark)

    val taskMs = TrieMap[Int, Vector[Long]]()     // stageId -> task run times
    val stageName = TrieMap[Int, String]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        val ms = Option(t.taskMetrics).map(_.executorRunTime).getOrElse(0L)
        taskMs.updateWith(t.stageId) {
          case Some(v) => Some(v :+ ms)
          case None => Some(Vector(ms))
        }
      }
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
        // the SQL node scopes of the stage's RDDs name the physical
        // operators (Exchange/HashAggregate/Generate...) — far more useful
        // than the callsite the stage name carries
        val scopes = s.stageInfo.rddInfos.flatMap(_.scope)
          .map(_.name).distinct.mkString(" | ")
        stageName(s.stageInfo.stageId) =
          if (scopes.nonEmpty) scopes else s.stageInfo.name.linesIterator.next()
      }
    })

    val t0 = System.nanoTime()
    SparkEntry.queries(name)(spark, sfDir)
      .write.format("noop").mode("overwrite").save()
    val wall = (System.nanoTime() - t0) / 1e9
    // listener bus is async — give it a moment to drain before reading
    Thread.sleep(2000)

    println(f"%nquery=$name wall=$wall%.1f s  (stages by total task time)")
    val rows = taskMs.toSeq.map { case (sid, ts) =>
      val sorted = ts.sorted
      (sid, ts.size, ts.sum, ts.max, sorted(ts.size / 2))
    }.sortBy(-_._3)
    println(f"${"stage"}%-6s${"ntask"}%-7s${"total_s"}%-9s${"max_s"}%-9s${"med_s"}%-9s name")
    rows.take(25).foreach { case (sid, n, tot, mx, med) =>
      println(f"$sid%-6d$n%-7d${tot / 1e3}%-9.1f${mx / 1e3}%-9.1f${med / 1e3}%-9.1f" +
        stageName.getOrElse(sid, "?").take(90))
    }
    spark.stop()
  }
}
