package org.apache.spark.sql.graft

import org.apache.datasketches.memory.Memory
import org.apache.datasketches.theta.{CompactSketch, SetOperation, Sketches => DsSketches, Union}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression, ExpressionInfo, Literal, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.{ImperativeAggregate, TypedImperativeAggregate}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.trees.{BinaryLike, UnaryLike}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types.{AbstractDataType, BinaryType, DataType, DoubleType, IntegerType, LongType, StringType, TypeCollection}
import org.apache.spark.unsafe.types.UTF8String

/** Native theta-sketch aggregates and set operations (Apache DataSketches,
  * the library already bundled for Spark's `hll_*` functions): persistable,
  * mergeable distinct-value summaries that — unlike HLL — support
  * INTERSECTION and DIFFERENCE, the two operations corpus-overlap questions
  * need ("how many of the benchmark's distinct fingerprints appear in the
  * training shard?", "how much NEW vocabulary did yesterday's crawl add?").
  * Build one small sketch per corpus/shard, persist it, and answer any
  * union/intersection/A-not-B cardinality later without rescanning raw
  * data; Spark's own sketch surface (`hll_sketch_agg`) is union-only.
  *
  * Scale contract: the shuffle carries one ≤`8·2^lgK`-byte sketch per group
  * per partition (map-side partial aggregation — [[TypedImperativeAggregate]],
  * serialized only at exchange boundaries, the `HllSketchAgg` pattern),
  * never the raw values. A theta sketch is EXACT while it has retained
  * ≤ `2^lgK` values (theta stays 1.0, every distinct hash is kept), and
  * set operations between exact sketches are exact; beyond capacity the
  * relative standard error is ~`1/sqrt(2^lgK)` (lgK=14 → ~0.8%). The
  * DuckDB oracle pins the exact regime value-for-value (the same
  * exact-regime trick as the KLL and Misra-Gries rows); the sampling-regime
  * envelope is an ApproxSpec property.
  *
  * Reference scope note: the reference engine has no sketch surface at all;
  * this family belongs to the training-data-pipeline extension surface
  * (decontamination overlap estimates, cross-shard vocabulary accounting).
  */
object ThetaOps {
  /** lgK=14 → 16384 nominal entries: exact to 16k distincts, ~0.8% rse
    * beyond, ≤128 KB serialized.
    */
  val DefaultLgK = 14

  def newUnion(lgK: Int): Union =
    SetOperation.builder().setLogNominalEntries(lgK).buildUnion()

  def wrap(bytes: Array[Byte]): CompactSketch =
    DsSketches.wrapCompactSketch(Memory.wrap(bytes))

  def lgKOf(e: Expression, name: String): Int = e.eval() match {
    case i: Int =>
      require(i >= 4 && i <= 26, s"$name: lgK must be in [4, 26], got $i")
      i
    case other => throw new IllegalArgumentException(
      s"$name: lgK must be a foldable int literal, got $other")
  }

  /** Column-API entry points. */
  def thetaAgg(value: Column, lgK: Int = DefaultLgK): Column =
    ExpressionUtils.column(
      ThetaSketchAgg(ExpressionUtils.expression(value), Literal(lgK)).toAggregateExpression())

  def thetaMerge(sketch: Column, lgK: Int = DefaultLgK): Column =
    ExpressionUtils.column(
      ThetaMergeAgg(ExpressionUtils.expression(sketch), Literal(lgK)).toAggregateExpression())

  def thetaIntersectAgg(sketch: Column): Column =
    ExpressionUtils.column(
      ThetaIntersectionAgg(ExpressionUtils.expression(sketch)).toAggregateExpression())

  def thetaEstimate(sketch: Column): Column =
    ExpressionUtils.column(ThetaEstimate(ExpressionUtils.expression(sketch)))

  def thetaIntersect(a: Column, b: Column): Column =
    ExpressionUtils.column(ThetaPairOp(
      ExpressionUtils.expression(a), ExpressionUtils.expression(b), ThetaPairOp.Intersect))

  def thetaUnionPair(a: Column, b: Column): Column =
    ExpressionUtils.column(ThetaPairOp(
      ExpressionUtils.expression(a), ExpressionUtils.expression(b), ThetaPairOp.UnionOp))

  def thetaANotB(a: Column, b: Column): Column =
    ExpressionUtils.column(ThetaPairOp(
      ExpressionUtils.expression(a), ExpressionUtils.expression(b), ThetaPairOp.ANotB))

  val aggDescriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) =
    (FunctionIdentifier("graft_theta_agg"),
      new ExpressionInfo(classOf[ThetaSketchAgg].getName, "graft_theta_agg"),
      (children: Seq[Expression]) => children match {
        case Seq(c) => ThetaSketchAgg(c, Literal(DefaultLgK))
        case Seq(c, k) => ThetaSketchAgg(c, k)
        case _ => throw new IllegalArgumentException("graft_theta_agg(value[, lgK])")
      })

  val mergeDescriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) =
    (FunctionIdentifier("graft_theta_merge"),
      new ExpressionInfo(classOf[ThetaMergeAgg].getName, "graft_theta_merge"),
      (children: Seq[Expression]) => children match {
        case Seq(c) => ThetaMergeAgg(c, Literal(DefaultLgK))
        case Seq(c, k) => ThetaMergeAgg(c, k)
        case _ => throw new IllegalArgumentException("graft_theta_merge(sketch[, lgK])")
      })

  val intersectAggDescriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) =
    (FunctionIdentifier("graft_theta_intersect_agg"),
      new ExpressionInfo(classOf[ThetaIntersectionAgg].getName, "graft_theta_intersect_agg"),
      (children: Seq[Expression]) => ThetaIntersectionAgg(children.head))

  val estimateDescriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) =
    (FunctionIdentifier("graft_theta_estimate"),
      new ExpressionInfo(classOf[ThetaEstimate].getName, "graft_theta_estimate"),
      (children: Seq[Expression]) => ThetaEstimate(children.head))

  val pairOpDescriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) =
    (FunctionIdentifier("graft_theta_set_op"),
      new ExpressionInfo(classOf[ThetaPairOp].getName, "graft_theta_set_op"),
      (children: Seq[Expression]) => children match {
        case Seq(a, b, op) => ThetaPairOp(a, b, op.eval() match {
          case s: UTF8String => s.toString
          case other => throw new IllegalArgumentException(
            s"graft_theta_set_op: op must be a string literal, got $other")
        })
        case _ => throw new IllegalArgumentException(
          "graft_theta_set_op(a, b, 'intersect'|'union'|'anotb')")
      })

  def register(spark: SparkSession): Unit =
    Seq(aggDescriptor, mergeDescriptor, intersectAggDescriptor, estimateDescriptor,
      pairOpDescriptor).foreach { d =>
      spark.sessionState.functionRegistry.registerFunction(d._1, d._2, d._3)
    }
}

/** Theta sketch of the distinct values of a column (BINARY compact image;
  * persist it, union/intersect/diff later). String, binary, and numeric
  * inputs are hashed by the library's type-specific hashers; integral types
  * are widened to long first so `INT 7` and `BIGINT 7` count as one value,
  * matching SQL DISTINCT.
  */
case class ThetaSketchAgg(
    left: Expression,
    right: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Union]
  with BinaryLike[Expression] with ExpectsInputTypes {

  private lazy val lgK: Int = ThetaOps.lgKOf(right, prettyName)

  override def prettyName: String = "graft_theta_agg"
  override def inputTypes: Seq[AbstractDataType] =
    Seq(TypeCollection(StringType, BinaryType, LongType, IntegerType, DoubleType),
      IntegerType)
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false

  // one virtual dispatch per row instead of a dataType match per row
  private lazy val updater: (Union, Any) => Unit = left.dataType match {
    case StringType => (u, v) => u.update(v.asInstanceOf[UTF8String].toString)
    case BinaryType => (u, v) => u.update(v.asInstanceOf[Array[Byte]])
    case LongType => (u, v) => u.update(v.asInstanceOf[Long])
    case IntegerType => (u, v) => u.update(v.asInstanceOf[Int].toLong)
    case DoubleType => (u, v) => u.update(v.asInstanceOf[Double])
    case other => throw new IllegalStateException(s"unreachable input type $other")
  }

  override def createAggregationBuffer(): Union = ThetaOps.newUnion(lgK)

  override def update(buffer: Union, input: InternalRow): Union = {
    val v = left.eval(input)
    if (v != null) updater(buffer, v)
    buffer
  }

  override def merge(buffer: Union, other: Union): Union = {
    buffer.union(other.getResult)
    buffer
  }

  override def eval(buffer: Union): Any = buffer.getResult.toByteArray

  override def serialize(buffer: Union): Array[Byte] = buffer.getResult.toByteArray
  override def deserialize(bytes: Array[Byte]): Union = {
    val u = ThetaOps.newUnion(lgK)
    u.union(Memory.wrap(bytes))
    u
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): ImperativeAggregate =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): ImperativeAggregate =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Union of serialized theta sketch images (BINARY → BINARY): the rollup
  * side over sketches read back from parquet. The result is itself a
  * sketch, so rollups compose.
  */
case class ThetaMergeAgg(
    left: Expression,
    right: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Union]
  with BinaryLike[Expression] with ExpectsInputTypes {

  private lazy val lgK: Int = ThetaOps.lgKOf(right, prettyName)

  override def prettyName: String = "graft_theta_merge"
  override def inputTypes: Seq[AbstractDataType] = Seq(BinaryType, IntegerType)
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false

  override def createAggregationBuffer(): Union = ThetaOps.newUnion(lgK)

  override def update(buffer: Union, input: InternalRow): Union = {
    val v = left.eval(input)
    if (v != null) buffer.union(Memory.wrap(v.asInstanceOf[Array[Byte]]))
    buffer
  }

  override def merge(buffer: Union, other: Union): Union = {
    buffer.union(other.getResult)
    buffer
  }

  override def eval(buffer: Union): Any = buffer.getResult.toByteArray

  override def serialize(buffer: Union): Array[Byte] = buffer.getResult.toByteArray
  override def deserialize(bytes: Array[Byte]): Union = {
    val u = ThetaOps.newUnion(lgK)
    u.union(Memory.wrap(bytes))
    u
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): ImperativeAggregate =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): ImperativeAggregate =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Intersection across serialized theta sketches (BINARY → BINARY): "values
  * present in EVERY input sketch" — core-vocabulary / always-present-key
  * questions over per-shard sketches. The aggregation identity is the
  * universal set, which has no finite representation, so the buffer tracks
  * "no input yet" explicitly ([[ThetaIntersectionAgg.Buf]]) and an
  * intersect over zero rows evaluates to null rather than lying with an
  * empty sketch. Null sketch rows are skipped (SQL aggregate convention).
  */
case class ThetaIntersectionAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[ThetaIntersectionAgg.Buf]
  with UnaryLike[Expression] with ExpectsInputTypes {

  import ThetaIntersectionAgg.Buf

  override def prettyName: String = "graft_theta_intersect_agg"
  override def inputTypes: Seq[AbstractDataType] = Seq(BinaryType)
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true

  override def createAggregationBuffer(): Buf = Buf(null)

  private def intersectInto(buf: Buf, sk: org.apache.datasketches.theta.Sketch): Buf = {
    buf.sk =
      if (buf.sk == null) sk.compact()
      else SetOperation.builder().buildIntersection().intersect(buf.sk, sk)
    buf
  }

  override def update(buffer: Buf, input: InternalRow): Buf = {
    val v = child.eval(input)
    if (v == null) buffer
    else intersectInto(buffer, ThetaOps.wrap(v.asInstanceOf[Array[Byte]]))
  }

  override def merge(buffer: Buf, other: Buf): Buf =
    if (other.sk == null) buffer else intersectInto(buffer, other.sk)

  override def eval(buffer: Buf): Any =
    if (buffer.sk == null) null else buffer.sk.toByteArray

  override def serialize(buffer: Buf): Array[Byte] =
    if (buffer.sk == null) Array.emptyByteArray else buffer.sk.toByteArray
  override def deserialize(bytes: Array[Byte]): Buf =
    if (bytes.isEmpty) Buf(null)
    else Buf(DsSketches.heapifyCompactSketch(Memory.wrap(bytes)))

  override def withNewMutableAggBufferOffset(newOffset: Int): ImperativeAggregate =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): ImperativeAggregate =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object ThetaIntersectionAgg {
  /** null sk = identity (universal set: nothing intersected yet). */
  final case class Buf(var sk: CompactSketch)
}

/** Distinct-count estimate from a serialized theta sketch image — exact
  * (and integral) while the sketch never sampled; ~`1/sqrt(2^lgK)` rse
  * beyond. Runs on post-aggregation rows, so interpreted eval is off the
  * hot path by construction (same placement as [[KllQuantiles]]).
  */
case class ThetaEstimate(child: Expression)
    extends UnaryExpression with ExpectsInputTypes with CodegenFallback {

  override def inputTypes: Seq[AbstractDataType] = Seq(BinaryType)
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_theta_estimate"

  override def nullSafeEval(bytes: Any): Any =
    ThetaOps.wrap(bytes.asInstanceOf[Array[Byte]]).getEstimate

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Scalar set operation between two serialized sketches (BINARY, BINARY →
  * BINARY): intersect / union / A-not-B of exactly two corpora, the
  * overlap-report shape. For N-ary rollups use the aggregates.
  */
case class ThetaPairOp(left: Expression, right: Expression, op: String)
    extends BinaryExpression with ExpectsInputTypes with CodegenFallback {

  import ThetaPairOp._
  require(op == Intersect || op == UnionOp || op == ANotB,
    s"graft_theta_set_op: op must be one of '$Intersect'/'$UnionOp'/'$ANotB', got '$op'")

  override def inputTypes: Seq[AbstractDataType] = Seq(BinaryType, BinaryType)
  override def dataType: DataType = BinaryType
  override def prettyName: String = "graft_theta_set_op"

  override def nullSafeEval(aBytes: Any, bBytes: Any): Any = {
    val a = ThetaOps.wrap(aBytes.asInstanceOf[Array[Byte]])
    val b = ThetaOps.wrap(bBytes.asInstanceOf[Array[Byte]])
    val out = op match {
      case Intersect => SetOperation.builder().buildIntersection().intersect(a, b)
      // lgK=26 (the library max): a PAIR union must not add sampling error
      // beyond its inputs' own caps — it holds everything both retained
      // (memory is bounded by the inputs' retained entries, the table grows
      // lazily). N-ary rollups that WANT a cap use ThetaMergeAgg's lgK.
      case UnionOp =>
        SetOperation.builder().setLogNominalEntries(26).buildUnion().union(a, b)
      case ANotB => SetOperation.builder().buildANotB().aNotB(a, b)
    }
    out.toByteArray
  }

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object ThetaPairOp {
  val Intersect = "intersect"
  val UnionOp = "union"
  val ANotB = "anotb"
}
