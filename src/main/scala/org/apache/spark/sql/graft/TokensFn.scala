package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Lowercased word tokens of a string in one native pass — the engine's
  * tokenizer ([[graft.ops.Text.tokens]] routes here).
  *
  * The column form `filter(split(lower(text), "\\W+"), t => length(t) > 0)`
  * pays the HOF tax on nearly every text-operator projection: `filter` is
  * CodegenFallback, so the lambda is dispatched interpreted per token AND
  * the enclosing projection falls out of whole-stage codegen; `split`
  * additionally burns a regex engine pass and materializes the empty
  * boundary tokens the filter then drops. This kernel scans the lowered
  * text once for maximal `\w+` runs (ASCII letters/digits/underscore —
  * Java's `\W` without UNICODE_CHARACTER_CLASS, the exact split contract)
  * — the same scanner [[ShingleBasesKernel]] and
  * [[DistinctShinglesKernel]] already use, spec-pinned against the
  * split-based reference.
  *
  * Null in → null out (split(null) propagated null through the old tree).
  */
object TokensKernel {
  def tokens(s: UTF8String): ArrayData = {
    val lower = s.toLowerCase.toString
    val n = lower.length
    val out = new java.util.ArrayList[Any](16)
    var runStart = -1
    var i = 0
    while (i <= n) {
      val w = i < n && {
        val c = lower.charAt(i)
        c == '_' || (c >= '0' && c <= '9') || (c >= 'a' && c <= 'z') ||
          (c >= 'A' && c <= 'Z')
      }
      if (w) {
        if (runStart < 0) runStart = i
      } else if (runStart >= 0) {
        out.add(UTF8String.fromString(lower.substring(runStart, i)))
        runStart = -1
      }
      i += 1
    }
    new GenericArrayData(out.toArray)
  }
}

case class Tokens(child: Expression)
    extends UnaryExpression with ImplicitCastInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_tokens_arr"

  override def nullSafeEval(input: Any): Any =
    TokensKernel.tokens(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = org.apache.spark.sql.graft.TokensKernel.tokens($c);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object Tokens {
  def tokens(text: Column): Column =
    ExpressionUtils.column(Tokens(ExpressionUtils.expression(text)))
}
