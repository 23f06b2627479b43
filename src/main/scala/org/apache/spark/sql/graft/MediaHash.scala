package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types.{AbstractDataType, BinaryType, DataType, LongType}

/** JVM kernels for the perceptual media hashes — byte-array arithmetic
  * behind the native [[ImageDHash]] / [[AudioFp]] expressions.
  *
  * Semantics are EXACTLY [[graft.ops.Multimodal.dHash]] /
  * [[graft.ops.Multimodal.audioFingerprint]]'s column pipelines (which
  * remain as the oracle-transparent reference implementations, pinned
  * equal in MultimodalSpec): same header gates, same overflow-safe size
  * guard, same grid arithmetic, same null contract — including the
  * column path's edge behavior where a slice that runs off the payload
  * end yields a null sample and therefore an UNSET bit, not a null hash.
  *
  * Why a custom Expression (SURVEY §7.3 preference order: builtin >
  * Expression > UDF): the column composition stages 72 gray columns
  * whose expression trees the optimizer re-walks on every plan — ~1.5 s
  * of driver time per batch execution and the dominant cost of streaming
  * micro-batch replanning. One expression node is ~nothing to plan, and
  * the kernel reads bytes directly (~100 ns/row vs ~6 µs through
  * hex/conv columns).
  */
object MediaHashKernel {

  /** Little-endian unsigned int of `len` bytes at 0-based `off`. */
  private def le(p: Array[Byte], off: Int, len: Int): Long = {
    var v = 0L; var k = 0
    while (k < len) { v |= (p(off + k) & 0xffL) << (8 * k); k += 1 }
    v
  }

  private def signed32(v: Long): Long = if (v >= 0x80000000L) v - 0x100000000L else v

  private def magic4(p: Array[Byte], off: Int, m: String): Boolean =
    p(off) == m.charAt(0).toByte && p(off + 1) == m.charAt(1).toByte &&
      p(off + 2) == m.charAt(2).toByte && p(off + 3) == m.charAt(3).toByte

  /** 63-bit dHash of a 24bpp BITMAPINFOHEADER BMP; null for anything else
    * (same guards as the column pipeline, division form — a garbage
    * header's dims can never overflow-validate a truncated payload).
    */
  def dhash(p: Array[Byte]): java.lang.Long = {
    if (p == null || p.length < 54) return null
    if (p(0) != 'B' || p(1) != 'M') return null
    if (le(p, 14, 4) != 40L || le(p, 28, 2) != 24L) return null
    val w = signed32(le(p, 18, 4))
    val h = signed32(le(p, 22, 4))
    val off = le(p, 10, 4)
    if (w <= 0 || h <= 0) return null
    val rs = (w * 3 + 3) / 4 * 4
    // truncation-toward-zero vs the column floor differs only for a
    // negative numerator, where both sides are < h anyway (h >= 1)
    if ((p.length.toLong - off) / rs < h) return null
    var hash = 0L
    var j = 0
    while (j < 9) {
      val y = h * j / 9
      var prev = 0L
      var i = 0
      while (i < 8) {
        val pos = (off + y * rs + 3L * (w * i / 8)).toInt
        val g = ((p(pos) & 0xff) + (p(pos + 1) & 0xff) + (p(pos + 2) & 0xff)) / 3L
        if (i > 0 && prev < g) hash |= 1L << (j * 7 + i - 1)
        prev = g
        i += 1
      }
      j += 1
    }
    hash
  }

  private val NullSample = Long.MinValue

  /** 63-bit temporal-envelope fingerprint of a canonical 16-bit PCM WAV;
    * null for anything else. A grid point whose 2 sample bytes run off
    * the payload end yields a null sample → its comparisons stay unset
    * (bit 0), matching the column pipeline's conv('')→null behavior.
    */
  def audioFp(p: Array[Byte]): java.lang.Long = {
    if (p == null || p.length < 46) return null
    if (!magic4(p, 0, "RIFF") || !magic4(p, 8, "WAVE") ||
      !magic4(p, 12, "fmt ") || !magic4(p, 36, "data")) return null
    if (le(p, 34, 2) != 16L) return null
    val ba = le(p, 32, 2)
    val dl = math.min(le(p, 40, 4), p.length.toLong - 44L)
    if (ba <= 0 || dl < ba) return null
    val n = dl / ba
    def energy(k: Int): Long = {
      val pos = 44L + n * k / 64 * ba
      if (pos + 2 > p.length) return NullSample
      val i = pos.toInt
      val v = (p(i) & 0xff) | ((p(i + 1) & 0xff) << 8)
      math.abs(if (v >= 32768) v - 65536 else v).toLong
    }
    var hash = 0L
    var prev = energy(0)
    var k = 1
    while (k < 64) {
      val e = energy(k)
      if (prev != NullSample && e != NullSample && prev < e) hash |= 1L << (k - 1)
      prev = e
      k += 1
    }
    hash
  }
}

/** Native 63-bit image dHash over a BINARY payload column. */
case class ImageDHash(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(BinaryType)
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_dhash"
  // null for undecodable payloads regardless of child nullability — and
  // the override keeps ev.isNull a mutable slot (see DotProduct's note)
  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any =
    MediaHashKernel.dhash(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val r = ctx.freshName("dh")
      s"""
         |java.lang.Long $r = org.apache.spark.sql.graft.MediaHashKernel.dhash($c);
         |if ($r == null) { ${ev.isNull} = true; } else { ${ev.value} = $r.longValue(); }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object ImageDHash {
  def dhash(payload: Column): Column =
    ExpressionUtils.column(ImageDHash(ExpressionUtils.expression(payload)))

  val functionDescriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) =
    (FunctionIdentifier("graft_dhash"),
      new ExpressionInfo(classOf[ImageDHash].getName, "graft_dhash"),
      (children: Seq[Expression]) => ImageDHash(children.head))

  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.registerFunction(
      functionDescriptor._1, functionDescriptor._2, functionDescriptor._3)
}

/** Native 63-bit audio fingerprint over a BINARY payload column. */
case class AudioFp(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(BinaryType)
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_audio_fp"
  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any =
    MediaHashKernel.audioFp(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val r = ctx.freshName("afp")
      s"""
         |java.lang.Long $r = org.apache.spark.sql.graft.MediaHashKernel.audioFp($c);
         |if ($r == null) { ${ev.isNull} = true; } else { ${ev.value} = $r.longValue(); }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object AudioFp {
  def fp(payload: Column): Column =
    ExpressionUtils.column(AudioFp(ExpressionUtils.expression(payload)))

  val functionDescriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) =
    (FunctionIdentifier("graft_audio_fp"),
      new ExpressionInfo(classOf[AudioFp].getName, "graft_audio_fp"),
      (children: Seq[Expression]) => AudioFp(children.head))

  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.registerFunction(
      functionDescriptor._1, functionDescriptor._2, functionDescriptor._3)
}
