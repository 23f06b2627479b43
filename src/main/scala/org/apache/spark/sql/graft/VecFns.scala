package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, DoubleType}

/** (x − mean)·comp against plan-constant mean/component arrays — the PCA
  * projection kernel ([[graft.ops.Pca.project]]/`whiten`/`projectVector`/
  * `whitenVector` route here).
  *
  * The column form centered per row with an interpreted `zip_with`
  * (CodegenFallback — a 64-element GenericArrayData allocated per row,
  * two lambda dispatches per element) and then ran k native dots against
  * it. This kernel fuses centering into each dot: same IEEE sequence
  * ((x_i − m_i)·c_i, ascending-index summation), so every persisted-model
  * replay and floor6 comparison is bit-identical (PcaSpec pins it).
  *
  * Null semantics mirror the zip_with+dot chain: null x → null; a null
  * x element in the first |comp| positions → null; |x| < |comp| → null
  * (zip_with padded the mean side, so the dot hit a null element);
  * |x| > |comp| extras were never read by the dot — ignored here too.
  */
object CenteredDotKernel {
  def compute(x: ArrayData, mean: Array[Double], comp: Array[Double]): java.lang.Double = {
    val d = comp.length
    if (x.numElements() < d) return null
    var sum = 0.0
    var i = 0
    while (i < d) {
      if (x.isNullAt(i)) return null
      sum += (x.getDouble(i) - mean(i)) * comp(i)
      i += 1
    }
    java.lang.Double.valueOf(sum)
  }
}

case class CenteredDot(child: Expression, mean: Seq[Double], comp: Seq[Double])
    extends UnaryExpression with ImplicitCastInputTypes {

  require(mean.length == comp.length,
    s"mean/component dims differ: ${mean.length}/${comp.length}")

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(DoubleType))
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_centered_dot"

  /** Short/null-element inputs null the result even under a non-nullable
    * array column — the [[DotProduct]] nullability footnote.
    */
  override def nullable: Boolean = true

  @transient private lazy val meanArr = mean.toArray
  @transient private lazy val compArr = comp.toArray

  override def nullSafeEval(input: Any): Any =
    CenteredDotKernel.compute(input.asInstanceOf[ArrayData], meanArr, compArr)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val mRef = ctx.addReferenceObj("pcaMean", meanArr, "double[]")
    val cRef = ctx.addReferenceObj("pcaComp", compArr, "double[]")
    nullSafeCodeGen(ctx, ev, in => {
      val tmp = ctx.freshName("boxed")
      s"""
         |java.lang.Double $tmp =
         |  org.apache.spark.sql.graft.CenteredDotKernel.compute($in, $mRef, $cRef);
         |if ($tmp == null) { ${ev.isNull} = true; } else { ${ev.value} = $tmp.doubleValue(); }
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object CenteredDot {
  def centeredDot(x: Column, mean: Seq[Double], comp: Seq[Double]): Column =
    ExpressionUtils.column(
      CenteredDot(ExpressionUtils.expression(x), mean, comp))
}

/** Symmetric int8 quantization of a double vector in one native pass —
  * the [[graft.ops.Similarity.quantizeInt8]] kernel: scale = maxabs/127,
  * codes = round-half-up(v·127/maxabs) clamped to ±127, all-zero codes
  * for the zero vector. The column form paid three interpreted
  * `transform` lambdas per row (abs for array_max, the code map, the
  * zero fallback). Same IEEE sequence per element
  * (floor(x·127/m + 0.5), clamp), so codes — and every oracle replay of
  * the quantization — are bit-identical (SimilaritySpec pins it).
  *
  * Returns array<long> codes; null in → null out; a null ELEMENT nulls
  * the maxabs in the column form (abs(null) → array_max skips null…
  * array_max IGNORES nulls, then the code transform maps the null
  * element to null) — mirrored exactly: null elements are skipped for
  * maxabs and emitted as null codes.
  */
object QuantizeInt8Kernel {
  // DOCUMENTED edge divergence (ADVICE r21): the max-abs scan uses
  // `a > m`, which ignores NaN unless it is the first non-null element;
  // the reference's array_max treats NaN as greater than everything (and
  // would then throw on the ANSI NaN→long cast). NaN vector elements are
  // out of contract — no table stores them and the spec corpus pins the
  // finite domain — so the kernel keeps the branch-free comparison.
  def codes(x: ArrayData): ArrayData = {
    val n = x.numElements()
    var m = 0.0
    var any = false
    var i = 0
    while (i < n) {
      if (!x.isNullAt(i)) {
        val a = math.abs(x.getDouble(i))
        if (!any || a > m) { m = a; any = true }
      }
      i += 1
    }
    val out = new Array[Any](n)
    i = 0
    if (any && m > 0) {
      while (i < n) {
        out(i) =
          if (x.isNullAt(i)) null
          else {
            val v = math.floor(x.getDouble(i) * 127.0 / m + 0.5).toLong
            java.lang.Long.valueOf(math.max(-127L, math.min(127L, v)))
          }
        i += 1
      }
    } else {
      while (i < n) {
        out(i) = if (x.isNullAt(i)) null else java.lang.Long.valueOf(0L)
        i += 1
      }
    }
    new GenericArrayData(out)
  }

  /** The paired maxabs (the scale numerator) — null when every element
    * is null (array_max over an all-null/empty array).
    */
  def maxAbs(x: ArrayData): java.lang.Double = {
    val n = x.numElements()
    var m = 0.0
    var any = false
    var i = 0
    while (i < n) {
      if (!x.isNullAt(i)) {
        val a = math.abs(x.getDouble(i))
        if (!any || a > m) { m = a; any = true }
      }
      i += 1
    }
    if (any) java.lang.Double.valueOf(m) else null
  }
}

case class QuantizeInt8(child: Expression)
    extends UnaryExpression with ImplicitCastInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(DoubleType))
  override def dataType: DataType = ArrayType(org.apache.spark.sql.types.LongType,
    containsNull = true)
  override def prettyName: String = "graft_quantize_int8"

  override def nullSafeEval(input: Any): Any =
    QuantizeInt8Kernel.codes(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, in =>
      s"${ev.value} = org.apache.spark.sql.graft.QuantizeInt8Kernel.codes($in);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

case class MaxAbs(child: Expression)
    extends UnaryExpression with ImplicitCastInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(DoubleType))
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_max_abs"

  /** All-null/empty arrays null the result (array_max semantics). */
  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any =
    QuantizeInt8Kernel.maxAbs(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, in => {
      val tmp = ctx.freshName("boxed")
      s"""
         |java.lang.Double $tmp = org.apache.spark.sql.graft.QuantizeInt8Kernel.maxAbs($in);
         |if ($tmp == null) { ${ev.isNull} = true; } else { ${ev.value} = $tmp.doubleValue(); }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** floor(x·scale) per element as long — the micro-quantization transform
  * of [[graft.ops.KMeans.quantize]] / [[graft.ops.Pca]]'s covariance
  * pass, one native loop instead of an interpreted per-element
  * `transform` lambda. Implicit input cast to array<double> performs the
  * same exact float→double promotion the column form's `x.cast("double")`
  * did; null elements stay null.
  */
object FloorScaleKernel {
  // DOCUMENTED edge divergence (ADVICE r21): `.toLong` saturates on a
  // non-finite or out-of-long-range double where the reference
  // `floor(x*scale).cast("long")` throws under the session's ANSI mode.
  // Micro-quantization inputs are embedding coordinates in [-1, 1] and
  // d² distances bounded by the int8 code range — the saturating branch
  // is unreachable on contract inputs; kept (rather than Math.*Exact)
  // because floor's double result has no exact long check cheaper than
  // the range compare this comment replaces.
  def compute(x: ArrayData, scale: Int): ArrayData = {
    val n = x.numElements()
    val out = new Array[Any](n)
    var i = 0
    while (i < n) {
      out(i) =
        if (x.isNullAt(i)) null
        else java.lang.Long.valueOf(math.floor(x.getDouble(i) * scale).toLong)
      i += 1
    }
    new GenericArrayData(out)
  }
}

case class FloorScale(child: Expression, scale: Int)
    extends UnaryExpression with ImplicitCastInputTypes {

  require(scale > 0, s"scale must be positive, got $scale")

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(DoubleType))
  override def dataType: DataType = ArrayType(org.apache.spark.sql.types.LongType,
    containsNull = true)
  override def prettyName: String = "graft_floor_scale"

  override def nullSafeEval(input: Any): Any =
    FloorScaleKernel.compute(input.asInstanceOf[ArrayData], scale)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, in =>
      s"${ev.value} = org.apache.spark.sql.graft.FloorScaleKernel.compute($in, $scale);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object VecFns {
  def quantizeInt8(x: Column): Column =
    ExpressionUtils.column(QuantizeInt8(ExpressionUtils.expression(x)))
  def maxAbs(x: Column): Column =
    ExpressionUtils.column(MaxAbs(ExpressionUtils.expression(x)))
  def floorScale(x: Column, scale: Int): Column =
    ExpressionUtils.column(FloorScale(ExpressionUtils.expression(x), scale))
}
