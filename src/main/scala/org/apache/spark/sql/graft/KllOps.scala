package org.apache.spark.sql.graft

import org.apache.datasketches.kll.KllDoublesSketch
import org.apache.datasketches.memory.Memory
import org.apache.datasketches.quantilescommon.QuantileSearchCriteria

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression, ExpressionInfo, ImplicitCastInputTypes, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.{ImperativeAggregate, TypedImperativeAggregate}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, BinaryType, DataType, DoubleType, IntegerType}

/** Native KLL quantile-sketch aggregates (Apache DataSketches, the same
  * library Spark's own `hll_*` functions bundle): persistable, MERGEABLE
  * rank/quantile summaries — the quantile twin of [[graft.ops.Sketches]]'
  * HLL distinct sketches. Build one small binary sketch per partition key,
  * persist it, answer any-range percentile questions later by unioning
  * sketches — never rescanning the raw data. Spark's built-in
  * `approx_percentile`/`percentile_approx` computes a one-shot estimate
  * whose summary dies with the query; there is no OSS SQL surface for
  * storing or merging the sketch itself (the gap this fills).
  *
  * Scale contract: the shuffle carries one ≤`O(k log n)`-byte sketch per
  * group per partition (map-side partial aggregation applies — this is a
  * [[TypedImperativeAggregate]], serialized only at exchange boundaries,
  * exactly the `HllSketchAgg` pattern), never the raw values. KLL's
  * normalized rank error is a pure function of k (k=200 → ~1.65%); while a
  * sketch has seen ≤ k items it retains ALL of them and every quantile is
  * EXACT under `INCLUSIVE` search — the property the DuckDB oracle pins
  * (same exact-regime trick as the Misra-Gries `freq_heavy_hitters` row).
  *
  * Reference scope note: the reference engine has no quantile surface at
  * all (its KSQL layer predates ksqlDB's percentile UDAFs) — this family
  * belongs to the training-data-pipeline extension surface (corpus length /
  * quality-score distributions per shard, merged fleet-wide).
  */
case class KllSketchAgg(
    left: Expression,
    right: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KllDoublesSketch]
  with BinaryLike[Expression] with ImplicitCastInputTypes {

  def this(child: Expression) = this(child, Literal(KllOps.DefaultK), 0, 0)
  def this(child: Expression, k: Expression) = this(child, k, 0, 0)

  private lazy val k: Int = right.eval() match {
    case i: Int => i
    case other => throw new IllegalArgumentException(
      s"graft_kll_agg: k must be a foldable int literal, got $other")
  }

  override def prettyName: String = "graft_kll_agg"
  override def inputTypes: Seq[AbstractDataType] = Seq(DoubleType, IntegerType)
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false

  override def createAggregationBuffer(): KllDoublesSketch =
    KllDoublesSketch.newHeapInstance(k)

  override def update(buffer: KllDoublesSketch, input: InternalRow): KllDoublesSketch = {
    val v = left.eval(input)
    // null and NaN are skipped (NaN has no rank; DataSketches rejects it)
    if (v != null) {
      val d = v.asInstanceOf[Double]
      if (!java.lang.Double.isNaN(d)) buffer.update(d)
    }
    buffer
  }

  override def merge(buffer: KllDoublesSketch, other: KllDoublesSketch): KllDoublesSketch = {
    buffer.merge(other)
    buffer
  }

  override def eval(buffer: KllDoublesSketch): Any = buffer.toByteArray

  override def serialize(buffer: KllDoublesSketch): Array[Byte] = buffer.toByteArray
  override def deserialize(bytes: Array[Byte]): KllDoublesSketch =
    KllDoublesSketch.heapify(Memory.wrap(bytes))

  override def withNewMutableAggBufferOffset(newOffset: Int): ImperativeAggregate =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): ImperativeAggregate =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Union of serialized KLL sketch images (BINARY → BINARY): the rollup
  * side — daily → monthly, per-source → global — over sketches read back
  * from parquet. Merging never needs the raw data; the result is itself a
  * sketch, so rollups compose (associativity is a spec property).
  */
case class KllMergeAgg(
    left: Expression,
    right: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KllDoublesSketch]
  with BinaryLike[Expression] with ExpectsInputTypes {

  def this(child: Expression) = this(child, Literal(KllOps.DefaultK), 0, 0)
  def this(child: Expression, k: Expression) = this(child, k, 0, 0)

  private lazy val k: Int = right.eval() match {
    case i: Int => i
    case other => throw new IllegalArgumentException(
      s"graft_kll_merge: k must be a foldable int literal, got $other")
  }

  override def prettyName: String = "graft_kll_merge"
  override def inputTypes: Seq[AbstractDataType] = Seq(BinaryType, IntegerType)
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false

  override def createAggregationBuffer(): KllDoublesSketch =
    KllDoublesSketch.newHeapInstance(k)

  override def update(buffer: KllDoublesSketch, input: InternalRow): KllDoublesSketch = {
    val v = left.eval(input)
    if (v != null) {
      buffer.merge(KllDoublesSketch.heapify(Memory.wrap(v.asInstanceOf[Array[Byte]])))
    }
    buffer
  }

  override def merge(buffer: KllDoublesSketch, other: KllDoublesSketch): KllDoublesSketch = {
    buffer.merge(other)
    buffer
  }

  override def eval(buffer: KllDoublesSketch): Any = buffer.toByteArray

  override def serialize(buffer: KllDoublesSketch): Array[Byte] = buffer.toByteArray
  override def deserialize(bytes: Array[Byte]): KllDoublesSketch =
    KllDoublesSketch.heapify(Memory.wrap(bytes))

  override def withNewMutableAggBufferOffset(newOffset: Int): ImperativeAggregate =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): ImperativeAggregate =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Quantile probe over a serialized KLL sketch image: `(sketch BINARY,
  * ranks ARRAY<DOUBLE>) → ARRAY<DOUBLE>` under INCLUSIVE search semantics
  * (result[i] = smallest stored value whose `count(≤ v)/n ≥ ranks[i]` —
  * exactly SQL `cume_dist`, which is what makes the DuckDB oracle a
  * one-liner). Null for an empty sketch (no rank is defined) or a null
  * rank entry. Runs on post-aggregation rows (one per group), so
  * interpreted eval is off the hot path by construction.
  */
case class KllQuantiles(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes with CodegenFallback {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(BinaryType, ArrayType(DoubleType))
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_kll_quantiles"

  override def nullSafeEval(sketchBytes: Any, ranksData: Any): Any = {
    val sketch = KllDoublesSketch.heapify(
      Memory.wrap(sketchBytes.asInstanceOf[Array[Byte]]))
    if (sketch.isEmpty) return null
    val ranks = ranksData.asInstanceOf[ArrayData]
    val n = ranks.numElements()
    val out = new Array[Double](n)
    var i = 0
    while (i < n) {
      if (ranks.isNullAt(i)) return null
      out(i) = sketch.getQuantile(ranks.getDouble(i), QuantileSearchCriteria.INCLUSIVE)
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object KllOps {
  /** k=1024: ~0.7% normalized rank error once compacting; EXACT while a
    * sketch (including a merged one) has seen ≤ 1024 values. ~8 KB max.
    */
  val DefaultK = 1024

  /** Column-API entry points. */
  def kllAgg(value: Column, k: Int = DefaultK): Column =
    ExpressionUtils.column(
      KllSketchAgg(ExpressionUtils.expression(value), Literal(k)).toAggregateExpression())

  def kllMerge(sketch: Column, k: Int = DefaultK): Column =
    ExpressionUtils.column(
      KllMergeAgg(ExpressionUtils.expression(sketch), Literal(k)).toAggregateExpression())

  def kllQuantiles(sketch: Column, ranks: Seq[Double]): Column =
    ExpressionUtils.column(
      KllQuantiles(ExpressionUtils.expression(sketch),
        Literal.create(ranks, ArrayType(DoubleType))))

  val aggDescriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) =
    (FunctionIdentifier("graft_kll_agg"),
      new ExpressionInfo(classOf[KllSketchAgg].getName, "graft_kll_agg"),
      (children: Seq[Expression]) => children match {
        case Seq(c) => new KllSketchAgg(c)
        case Seq(c, k) => new KllSketchAgg(c, k)
        case _ => throw new IllegalArgumentException("graft_kll_agg(value[, k])")
      })

  val mergeDescriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) =
    (FunctionIdentifier("graft_kll_merge"),
      new ExpressionInfo(classOf[KllMergeAgg].getName, "graft_kll_merge"),
      (children: Seq[Expression]) => children match {
        case Seq(c) => new KllMergeAgg(c)
        case Seq(c, k) => new KllMergeAgg(c, k)
        case _ => throw new IllegalArgumentException("graft_kll_merge(sketch[, k])")
      })

  val quantilesDescriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) =
    (FunctionIdentifier("graft_kll_quantiles"),
      new ExpressionInfo(classOf[KllQuantiles].getName, "graft_kll_quantiles"),
      (children: Seq[Expression]) => KllQuantiles(children.head, children(1)))

  def register(spark: SparkSession): Unit =
    Seq(aggDescriptor, mergeDescriptor, quantilesDescriptor).foreach { d =>
      spark.sessionState.functionRegistry.registerFunction(d._1, d._2, d._3)
    }
}
