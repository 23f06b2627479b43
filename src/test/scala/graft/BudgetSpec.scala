package graft

/** The gate's non-termination guard ([[Budget]]): a deliberately
  * pathological body must trip the budget and come back as an error
  * string — loudly, promptly, and without killing the caller — while
  * well-behaved and merely-throwing bodies report as themselves. This is
  * the r11 lesson as a pinned contract: the class of bug that zeroed
  * CORRECTNESS_r11 (planning that never returns) can cost at most one
  * red row and `budgetSec` seconds per query.
  */
class BudgetSpec extends SparkSpec {

  test("a completing body returns None") {
    assert(Budget.run(spark.sparkContext, "ok", budgetSec = 30) {
      spark.range(10).count(): Unit
    } === None)
  }

  test("a throwing body reports the exception, not a timeout") {
    val err = Budget.run(spark.sparkContext, "boom", budgetSec = 30) {
      throw new IllegalStateException("deliberate")
    }
    assert(err.exists(m => m.contains("IllegalStateException") && m.contains("deliberate")))
  }

  test("a non-terminating body trips the budget and the caller survives") {
    // stands in for a wedged Catalyst planning thread: spins past the
    // budget, ignores interrupts (the flag only releases the leaked
    // daemon thread after the breach has been reported, so the test
    // doesn't burn a core for the rest of the JVM)
    val stop = new java.util.concurrent.atomic.AtomicBoolean(false)
    val t0 = System.nanoTime()
    val err = Budget.run(spark.sparkContext, "hang", budgetSec = 1) {
      while (!stop.get()) Thread.`yield`()
    }
    val elapsedSec = (System.nanoTime() - t0) / 1e9
    stop.set(true)
    assert(err.exists(_.startsWith("Timeout")), s"got $err")
    assert(elapsedSec < 10.0, f"budget breach took $elapsedSec%.1f s to report")
    // the caller's session is still usable after the breach
    assert(spark.range(5).count() === 5L)
  }
}
