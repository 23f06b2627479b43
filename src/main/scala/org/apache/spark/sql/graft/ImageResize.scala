package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types.{AbstractDataType, BinaryType, DataType}

/** Nearest-neighbor resize kernel for 24bpp BITMAPINFOHEADER BMP payloads —
  * the codec-free RESIZE member of the multimodal prep family
  * ([[MediaHashKernel]] hashes, `Multimodal.imageBands` tiles, this
  * rescales). Output pixel (i, j) copies source pixel
  * (w·i / w2, h·j / h2) — the same truncating grid arithmetic the dHash
  * sampler uses, so `dhash(resize(p, w, h)) == dhash(p)` when dims are
  * unchanged (MultimodalSpec pins it).
  *
  * Why a custom Expression (SURVEY §7.3 preference order): building the
  * resized payload from column primitives needs w2·h2 staged `substr`
  * slices — the exact plan-size blowup class the round-11 dHash hang
  * taught us to keep out of Catalyst. One expression node plans in
  * constant time; the kernel copies bytes directly.
  */
object ImageResizeKernel {

  private def le(p: Array[Byte], off: Int, len: Int): Long = {
    var v = 0L; var k = 0
    while (k < len) { v |= (p(off + k) & 0xffL) << (8 * k); k += 1 }
    v
  }

  private def signed32(v: Long): Long = if (v >= 0x80000000L) v - 0x100000000L else v

  private def putLe(out: Array[Byte], off: Int, len: Int, v: Long): Unit = {
    var k = 0
    while (k < len) { out(off + k) = ((v >> (8 * k)) & 0xff).toByte; k += 1 }
  }

  /** Resized 24bpp BMP (rows re-padded to 4-byte alignment, padding
    * zeroed); null for anything that fails the dHash family's guards —
    * non-BMP, non-24bpp, non-positive dims, or a payload too short for
    * its own header (overflow-safe division form).
    */
  def resize(p: Array[Byte], w2: Int, h2: Int): Array[Byte] = {
    if (p == null || p.length < 54) return null
    if (p(0) != 'B' || p(1) != 'M') return null
    if (le(p, 14, 4) != 40L || le(p, 28, 2) != 24L) return null
    val w = signed32(le(p, 18, 4))
    val h = signed32(le(p, 22, 4))
    val off = le(p, 10, 4)
    if (w <= 0 || h <= 0) return null
    val rs = (w * 3 + 3) / 4 * 4
    if ((p.length.toLong - off) / rs < h) return null
    val rs2 = (w2 * 3 + 3) / 4 * 4
    val out = new Array[Byte](54 + rs2 * h2)
    out(0) = 'B'; out(1) = 'M'
    putLe(out, 2, 4, out.length.toLong)
    putLe(out, 10, 4, 54L)
    putLe(out, 14, 4, 40L)
    putLe(out, 18, 4, w2.toLong)
    putLe(out, 22, 4, h2.toLong)
    putLe(out, 26, 2, 1L)
    putLe(out, 28, 2, 24L)
    var j = 0
    while (j < h2) {
      val sy = h * j / h2
      val srcRow = (off + sy * rs).toInt
      val dstRow = 54 + j * rs2
      var i = 0
      while (i < w2) {
        val sp = srcRow + 3 * ((w * i / w2).toInt)
        val dp = dstRow + 3 * i
        out(dp) = p(sp); out(dp + 1) = p(sp + 1); out(dp + 2) = p(sp + 2)
        i += 1
      }
      j += 1
    }
    out
  }
}

/** Native nearest-neighbor BMP resize over a BINARY payload column; target
  * dims are plan-time constants (1 ≤ dim ≤ 16384).
  */
case class ImageResize(child: Expression, w2: Int, h2: Int)
    extends UnaryExpression with ExpectsInputTypes {
  require(w2 >= 1 && w2 <= 16384 && h2 >= 1 && h2 <= 16384,
    s"resize dims must be in [1, 16384], got ${w2}x$h2")

  override def inputTypes: Seq[AbstractDataType] = Seq(BinaryType)
  override def dataType: DataType = BinaryType
  override def prettyName: String = "graft_resize"
  // null for undecodable payloads regardless of child nullability
  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any =
    ImageResizeKernel.resize(input.asInstanceOf[Array[Byte]], w2, h2)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val r = ctx.freshName("rz")
      s"""
         |byte[] $r = org.apache.spark.sql.graft.ImageResizeKernel.resize($c, $w2, $h2);
         |if ($r == null) { ${ev.isNull} = true; } else { ${ev.value} = $r; }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object ImageResize {
  def resize(payload: Column, w2: Int, h2: Int): Column =
    ExpressionUtils.column(ImageResize(ExpressionUtils.expression(payload), w2, h2))

  private def foldedInt(e: Expression, what: String): Int = {
    require(e.foldable, s"graft_resize $what must be a literal")
    e.eval() match {
      case i: Int => i
      case l: Long => l.toInt
      case other => throw new IllegalArgumentException(
        s"graft_resize $what must be an integer literal, got $other")
    }
  }

  val functionDescriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) =
    (FunctionIdentifier("graft_resize"),
      new ExpressionInfo(classOf[ImageResize].getName, "graft_resize"),
      (children: Seq[Expression]) => ImageResize(children.head,
        foldedInt(children(1), "width"), foldedInt(children(2), "height")))

  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.registerFunction(
      functionDescriptor._1, functionDescriptor._2, functionDescriptor._3)
}
