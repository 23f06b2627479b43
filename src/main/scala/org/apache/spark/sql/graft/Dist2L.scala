package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, LongType}

/** Native integer squared-L2 distance of two `array<long>` columns — the
  * k-means assignment kernel ([[graft.ops.KMeans]]'s hottest expression:
  * evaluated once per row PER CENTROID per Lloyd round).
  *
  * Why a custom Expression (the [[DotProduct]] rationale): the builtin
  * composition `aggregate(zip_with(a, b, (x,y) => (x-y)*(x-y)), 0L, _+_)`
  * is a higher-order function — CodegenFallback, so the whole projection
  * drops out of whole-stage codegen — and inside the k-means assignment
  * it additionally runs INSIDE a `transform` lambda, where each
  * evaluation allocates the zipped products array and dispatches two
  * interpreted lambdas per element. This kernel is one primitive loop.
  *
  * Semantics match the builtin composition EXACTLY (KMeansSpec pins it):
  * null array on either side → null; length mismatch → null (zip_with
  * pads the shorter side with nulls, the lambda nulls the product, the
  * fold nulls the sum); any null element in range → null; long overflow
  * THROWS (Math.*Exact — the ANSI-mode behavior of the builtin
  * arithmetic this replaces; quantized embeddings have ~32 bits of
  * headroom, so an overflow is a data pathology that must stay loud,
  * not wrap into a silently wrong argmin).
  */
case class Dist2L(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(LongType), ArrayType(LongType))
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_dist2l"

  /** Mismatched lengths / null elements null the result even for
    * non-nullable children — same footgun note as [[DotProduct]]: a wrong
    * `false` here makes codegen emit an assignment to a constant slot and
    * silently de-optimizes the stage.
    */
  override def nullable: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var sum = 0L
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      val d = Math.subtractExact(x.getLong(i), y.getLong(i))
      sum = Math.addExact(sum, Math.multiplyExact(d, d))
      i += 1
    }
    sum
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val d = ctx.freshName("d")
      val sum = ctx.freshName("sum")
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) { ${ev.isNull} = true; } else {
         |  long $sum = 0L;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    long $d = java.lang.Math.subtractExact($a.getLong($i), $b.getLong($i));
         |    $sum = java.lang.Math.addExact($sum, java.lang.Math.multiplyExact($d, $d));
         |  }
         |  ${ev.value} = $sum;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object Dist2L {
  def dist2l(a: Column, b: Column): Column =
    ExpressionUtils.column(
      Dist2L(ExpressionUtils.expression(a), ExpressionUtils.expression(b)))
}
