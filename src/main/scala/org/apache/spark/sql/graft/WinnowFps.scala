package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression, UnsafeArrayData}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native winnowing fingerprints (the MOSS scheme) over a normalized
  * ASCII string: polynomial k-gram hashes (Σ c_{i+j}·B^(k-1-j) mod 2^32),
  * minimum of each w-wide window, sorted-distinct output.
  *
  * Why a custom Expression (SURVEY §7.3 preference order): the
  * `transform`/`sequence`/`slice` array-HOF composition is interpreted —
  * per-element lambda dispatch and per-window array allocation dominate
  * the corpus fingerprinting hot path (measured: the md5→polynomial hash
  * swap alone recovered almost nothing because the HOF overhead, not the
  * hash, was the cost). This compiles to two tight primitive loops inside
  * whole-stage codegen.
  *
  * Contract: input must already be normalized to ASCII word chars (the
  * caller's `regexp_replace(lower(text), "\\W+", "")`) with length ≥ k —
  * the caller guards shorter docs onto its portable md5 fallback. Output
  * fps match the DuckDB oracle's arithmetic exactly (sorted order; the
  * consumer explodes to rows where order is immaterial).
  */
case class WinnowFps(child: Expression, k: Int, w: Int)
    extends UnaryExpression with ExpectsInputTypes {
  require(k >= 1 && w >= 1, s"winnow needs k,w >= 1, got k=$k w=$w")

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_winnow_fps"

  private val pows: Array[Long] = WinnowFps.polyPows(k)

  override def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[UTF8String].getBytes
    UnsafeArrayData.fromPrimitiveArray(WinnowFps.fps(bytes, k, w, pows))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val powsRef = ctx.addReferenceObj("winnowPows", pows, "long[]")
    nullSafeCodeGen(ctx, ev, s => {
      val bytes = ctx.freshName("bytes")
      val out = ctx.freshName("out")
      s"""
         |byte[] $bytes = $s.getBytes();
         |long[] $out = org.apache.spark.sql.graft.WinnowFps.fps($bytes, $k, $w, $powsRef);
         |${ev.value} =
         |  org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($out);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object WinnowFps {
  private val Mask = 4294967295L
  private val Base = 1000003L

  def polyPows(k: Int): Array[Long] =
    Iterator.iterate(1L)(p => (p * Base) & Mask).take(k).toArray

  /** Shared by interpreted eval and generated code: k-gram polynomial
    * hashes → w-window minima → sorted distinct. Single allocation-light
    * pass. Inputs shorter than k have no k-gram, so they yield an empty
    * array (the engine's [[graft.ops.Text.winnowFingerprints]] routes them
    * to its portable md5 fallback before reaching here; raw SQL callers
    * get no fingerprints rather than an executor crash).
    */
  def fps(bytes: Array[Byte], k: Int, w: Int, pows: Array[Long]): Array[Long] = {
    val n = bytes.length
    if (n < k) return new Array[Long](0)
    val m = n - k + 1
    val hs = new Array[Long](m)
    var i = 0
    while (i < m) {
      var h = 0L
      var j = 0
      while (j < k) { h += (bytes(i + j) & 0xffL) * pows(k - 1 - j); j += 1 }
      hs(i) = h & Mask
      i += 1
    }
    val wins = if (m >= w) m - w + 1 else 1
    val mins = new Array[Long](wins)
    if (m >= w) {
      i = 0
      while (i < wins) {
        var mn = hs(i)
        var j = 1
        while (j < w) { if (hs(i + j) < mn) mn = hs(i + j); j += 1 }
        mins(i) = mn
        i += 1
      }
    } else {
      var mn = hs(0)
      i = 1
      while (i < m) { if (hs(i) < mn) mn = hs(i); i += 1 }
      mins(0) = mn
    }
    java.util.Arrays.sort(mins)
    // in-place dedupe of the sorted minima
    var cnt = 0
    i = 0
    while (i < mins.length) {
      if (cnt == 0 || mins(i) != mins(cnt - 1)) { mins(cnt) = mins(i); cnt += 1 }
      i += 1
    }
    if (cnt == mins.length) mins else java.util.Arrays.copyOf(mins, cnt)
  }

  def winnow(norm: Column, k: Int, w: Int): Column =
    ExpressionUtils.column(WinnowFps(ExpressionUtils.expression(norm), k, w))

  private def litInt(e: Expression, what: String): Int = e match {
    case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(
      s"graft_winnow_fps: $what must be an integer literal, got $other")
  }

  /** SQL surface: `graft_winnow_fps(norm, k, w)` (k, w integer literals). */
  val functionDescriptor: (org.apache.spark.sql.catalyst.FunctionIdentifier,
      org.apache.spark.sql.catalyst.expressions.ExpressionInfo,
      Seq[Expression] => Expression) =
    (org.apache.spark.sql.catalyst.FunctionIdentifier("graft_winnow_fps"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[WinnowFps].getName, "graft_winnow_fps"),
      (children: Seq[Expression]) => {
        require(children.length == 3,
          s"graft_winnow_fps(norm, k, w) takes exactly 3 arguments, got ${children.length}")
        WinnowFps(children.head, litInt(children(1), "k"), litInt(children(2), "w"))
      })

  /** Runtime registration on an existing session. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.registerFunction(
      functionDescriptor._1, functionDescriptor._2, functionDescriptor._3)
}
