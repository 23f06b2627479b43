package org.apache.spark.sql.graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate

/** SQL surface for Spark's internal bloom-filter build/probe pair.
  *
  * Spark ships codegen'd bloom expressions for its own runtime join
  * filters, but neither is SQL-reachable in 4.1: `BloomFilterAggregate`
  * and `BloomFilterMightContain` are only planted by InjectRuntimeFilter.
  * Registering them as `graft_bloom_agg` / `graft_might_contain` lets
  * [[graft.ops.Bloom]] express an EXPLICIT bloom-pruned join as one
  * declarative plan: the bloom arrives as a scalar subquery, which is the
  * exact shape `BloomFilterMightContain.checkInputDataTypes` demands
  * (constant or scalar subquery — a join-produced attribute is rejected).
  *
  * Same `org.apache.spark.sql` packaging rationale as [[DotProduct]].
  */
object BloomOps {

  /** Arity gate: a wrong-arg-count SQL call must surface as the analyzer's
    * standard wrong-number-of-arguments error, not an
    * IndexOutOfBoundsException from the children(i) access below.
    */
  private def checkArity(name: String, expected: Int, children: Seq[Expression]): Unit =
    if (children.length != expected)
      throw org.apache.spark.sql.errors.QueryCompilationErrors.wrongNumArgsError(
        name, Seq(expected), children.length)

  /** graft_bloom_agg(xxhash64(k), estimatedNumItems, numBits) → binary.
    * The analyzer wraps a registered AggregateFunction in
    * AggregateExpression(Complete) itself.
    */
  val aggDescriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) =
    (FunctionIdentifier("graft_bloom_agg"),
      new ExpressionInfo(classOf[BloomFilterAggregate].getName, "graft_bloom_agg"),
      (children: Seq[Expression]) => {
        checkArity("graft_bloom_agg", 3, children)
        new BloomFilterAggregate(children.head, children(1), children(2))
      })

  val functionDescriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) =
    (FunctionIdentifier("graft_might_contain"),
      new ExpressionInfo(classOf[BloomFilterMightContain].getName, "graft_might_contain"),
      (children: Seq[Expression]) => {
        checkArity("graft_might_contain", 2, children)
        BloomFilterMightContain(children.head, children(1))
      })

  /** Idempotent runtime registration of both functions. */
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.registerFunction(
      aggDescriptor._1, aggDescriptor._2, aggDescriptor._3)
    spark.sessionState.functionRegistry.registerFunction(
      functionDescriptor._1, functionDescriptor._2, functionDescriptor._3)
  }
}
