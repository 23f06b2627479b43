package graft

import org.apache.spark.SparkContext

/** Per-query wall-clock budget shared by the correctness gates
  * ([[Verify]] and `EmptyInputSpec`). Round 11 proved exceptions are not
  * the only way a query can zero a round: a Catalyst planning
  * NON-TERMINATION hung the gate process before any artifact was written
  * — 0/201 checked. Running each query on its own daemon thread under a
  * hard budget turns that failure mode into one red row: a breach cancels
  * the query's job group (stops stuck EXECUTION), reports an error string
  * the caller records, and the rest of the board completes. A stuck
  * PLANNING thread is not interruptible, but as a daemon it merely burns
  * one core while everything else finishes — the failure is loud and
  * local, never an empty artifact.
  */
object Budget {

  /** Run `body` on a daemon thread under `budgetSec` seconds, inside job
    * group `name` (so a breach can cancel any running Spark jobs).
    * Returns None on success, Some(message) on exception or budget
    * breach.
    */
  def run(sc: SparkContext, name: String, budgetSec: Int)(body: => Unit): Option[String] = {
    val err = new java.util.concurrent.atomic.AtomicReference[Option[String]](None)
    val t = new Thread(() => {
      try {
        sc.setJobGroup(name, name, interruptOnCancel = true)
        body
      } catch { case e: Throwable =>
        err.set(Some(s"${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage).take(300)}"))
      } finally sc.clearJobGroup()
    }, s"budget-$name")
    t.setDaemon(true)
    t.start()
    t.join(budgetSec * 1000L)
    if (t.isAlive) {
      sc.cancelJobGroup(name)
      Some(s"Timeout: planning or execution exceeded ${budgetSec}s")
    } else err.get
  }
}
