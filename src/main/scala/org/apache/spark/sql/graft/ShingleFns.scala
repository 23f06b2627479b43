package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** One-pass 3-gram shingle base hashes — the native kernel behind
  * [[graft.ops.Dedup]]'s `explodedShingleHashes` (the front of every
  * minhash signature / LSH band / near-dup candidate pair).
  *
  * The column form paid the HOF tax on the hottest dedup path: an
  * interpreted `transform(toks, t => h32(t))` lambda per token, a second
  * interpreted `transform(sequence(...))` with three `element_at` calls
  * per shingle, plus the materialized token and hash arrays in between.
  * This kernel walks the lowered text once: per token it md5-hashes the
  * token bytes through the SAME [[H32Kernel]] the column path used (so
  * every hash — and every DuckDB oracle replay — is bit-identical), then
  * combines adjacent triples with the same masked integer arithmetic.
  *
  * Equivalence contract (spec-pinned against the retained column
  * reference form):
  *  - tokens are the nonempty `\W+` splits of `lower(text)` — i.e.
  *    maximal `\w+` runs;
  *  - base_i = ((h_i·1000003 + h_{i+1}) & 2^32-1)·1000003 + h_{i+2},
  *    masked — all < 2^52, no overflow, same longs as the Column math;
  *  - documents with < 3 tokens collapse to ONE whole-doc hash:
  *    h32(tokens joined by single spaces) — including the empty
  *    document, h32("").
  * Null text is handled by the CALLER (the old expression tree produced
  * `array(NULL)` for null text through size(null)/array_join(null)
  * propagation; [[graft.ops.Dedup]] keeps that exact behavior with an
  * explicit isNull branch).
  */
object ShingleBasesKernel {
  private val Mask = 0xFFFFFFFFL
  private val B = 1000003L

  def compute(s: UTF8String): ArrayData = {
    val lower = s.toLowerCase.toString
    val n = lower.length
    var hs = new Array[Long](16)
    var nTok = 0
    var joined: java.lang.StringBuilder = null // built lazily for <3 tokens
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
        val tok = lower.substring(runStart, i)
        if (nTok == hs.length) hs = java.util.Arrays.copyOf(hs, hs.length * 2)
        hs(nTok) = H32Kernel.h32(tok.getBytes(java.nio.charset.StandardCharsets.UTF_8))
        nTok += 1
        if (nTok <= 3) { // only ever needed for the <3-token fallback
          if (joined == null) joined = new java.lang.StringBuilder(tok)
          else joined.append(' ').append(tok)
        }
        runStart = -1
      }
      i += 1
    }
    if (nTok >= 3) {
      val out = new Array[Long](nTok - 2)
      var k = 0
      while (k < nTok - 2) {
        out(k) = (((hs(k) * B + hs(k + 1)) & Mask) * B + hs(k + 2)) & Mask
        k += 1
      }
      new GenericArrayData(out)
    } else {
      val doc = if (joined == null) "" else joined.toString
      new GenericArrayData(Array(
        H32Kernel.h32(doc.getBytes(java.nio.charset.StandardCharsets.UTF_8))))
    }
  }
}

case class ShingleBases(child: Expression)
    extends UnaryExpression with ImplicitCastInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(LongType, containsNull = true)
  override def prettyName: String = "graft_shingle_bases"

  override def nullSafeEval(input: Any): Any =
    ShingleBasesKernel.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = org.apache.spark.sql.graft.ShingleBasesKernel.compute($c);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object ShingleFns {
  def shingleBases(text: Column): Column =
    ExpressionUtils.column(ShingleBases(ExpressionUtils.expression(text)))
}
