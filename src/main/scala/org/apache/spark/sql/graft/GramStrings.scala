package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Every k-char window of a string as its own string — the native gram
  * producer for the EXACT (oracle-checkable raw-gram) side of
  * [[graft.ops.SubstrDedup]], twin of [[GramHashes]] on the hashed side.
  *
  * The column formulation (`transform(sequence(1, n-k+1), i =>
  * substr(text, i, k))`) pays twice: higher-order functions are
  * CodegenFallback (every element evaluated interpreted), and each
  * `substr(i, k)` walks the string's bytes from position 0 to find code
  * point i — O(n) per window, O(n²) per document. The kernel walks the
  * byte sequence ONCE to index every code point start, then each window
  * is a zero-copy slice over the shared byte array: O(n) indexing +
  * O(n·k) output bytes, nothing interpreted.
  *
  * Windows are CHARACTER-positioned exactly like SQL `substr` (code
  * points, not UTF-16 units or bytes): window at array index i covers
  * chars [i+1, i+k] 1-based — byte-identical output to the column form
  * (`SubstrDedupSpec` pins it on the real corpus). Documents shorter
  * than k yield an empty array; null in → null out (the caller's
  * posexplode then emits nothing, matching the old `when(n >= k, …)
  * .otherwise(array())` shape).
  */
object GramStringKernel {
  def grams(s: UTF8String, k: Int): ArrayData = {
    val b = s.getBytes // one defensive copy per document, shared by every slice
    val nb = b.length
    // code point start offsets (same byte-walk as UTF8String.numChars, so
    // invalid-UTF8 handling matches SQL substr exactly); offs(nChars) = nb
    val offs = new Array[Int](nb + 1)
    var nChars = 0
    var i = 0
    while (i < nb) {
      offs(nChars) = i
      i += UTF8String.numBytesForFirstByte(b(i))
      nChars += 1
    }
    offs(nChars) = nb
    if (nChars < k) return new GenericArrayData(Array.empty[AnyRef])
    val out = new Array[AnyRef](nChars - k + 1)
    var p = 0
    while (p + k <= nChars) {
      out(p) = UTF8String.fromBytes(b, offs(p), offs(p + k) - offs(p))
      p += 1
    }
    new GenericArrayData(out)
  }
}

case class GramStrings(child: Expression, k: Int)
    extends UnaryExpression with ImplicitCastInputTypes {

  require(k >= 2, s"window length k=$k must be >= 2")

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_gram_strings"

  override def nullSafeEval(input: Any): Any =
    GramStringKernel.grams(input.asInstanceOf[UTF8String], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = org.apache.spark.sql.graft.GramStringKernel.grams($c, $k);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object GramStrings {
  def gramStrings(text: Column, k: Int): Column =
    ExpressionUtils.column(GramStrings(ExpressionUtils.expression(text), k))
}
