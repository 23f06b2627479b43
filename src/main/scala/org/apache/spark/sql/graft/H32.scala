package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, BinaryType, DataType, LongType}

/** JVM kernel for the engine's portable 32-bit hash: the first 4 md5
  * digest bytes, big-endian, as an unsigned long — EXACTLY
  * `conv(substring(md5(x), 1, 8), 16, 10)` (the first 8 hex digits ARE
  * the first 4 bytes), the form every DuckDB oracle replays as
  * `('0x'||substr(md5(s),1,8))::BIGINT`.
  */
object H32Kernel {
  private val md = ThreadLocal.withInitial[java.security.MessageDigest](() =>
    java.security.MessageDigest.getInstance("MD5"))

  def h32(bytes: Array[Byte]): Long = {
    val m = md.get()
    m.reset()
    val d = m.digest(bytes)
    ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
      ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
  }
}

/** Native portable-h32 expression — the hash behind every minhash
  * signature, sampling admission, salt stride, and portable classifier
  * bucket in the engine ([[graft.ops.Text.h32]] routes here).
  *
  * Why native (SURVEY §7.3): the column composition
  * `conv(substring(md5(x),1,8),16,10)` computes the 16-byte digest, hex-
  * encodes all 32 chars, slices 8, and PARSES them back — three string
  * round-trips per hash on the hottest per-token paths in the engine
  * (streaming LSH measured "per-row md5+signature work dominates"). The
  * kernel reads 4 digest bytes directly; values are identical, so every
  * DuckDB oracle replay is untouched.
  *
  * Input follows `md5()` exactly: BINARY with the same implicit cast
  * (strings hash their UTF-8 bytes); null in → null out.
  */
case class H32(child: Expression)
    extends UnaryExpression with ImplicitCastInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(BinaryType)
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_h32"

  override def nullSafeEval(input: Any): Any =
    H32Kernel.h32(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = org.apache.spark.sql.graft.H32Kernel.h32($c);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object H32 {
  /** Column-API entry point (the body of [[graft.ops.Text.h32]]). */
  def h32(c: Column): Column =
    ExpressionUtils.column(H32(ExpressionUtils.expression(c)))
}
