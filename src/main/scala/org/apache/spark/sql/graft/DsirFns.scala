package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, IntegerType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** DSIR hashed-feature buckets of a document in one native pass —
  * 1-based bucket ids of every unigram then every space-joined bigram,
  * exactly `transform(concat(ts, bigrams), f => (pmod(h32(f), B) + 1))`
  * over `ts = Text.tokens(text)` (the column form [[graft.ops.Dsir]]
  * carried through r20, kept there as the spec-pinned reference).
  *
  * The column form paid, per document: the tokenizer HOF, an interpreted
  * `transform` building every bigram STRING via concat, then h32+pmod
  * per feature — all dispatched per element outside codegen. The kernel
  * tokenizes once (the [[TokensKernel]] scanner, spec-pinned ≡ split)
  * and md5-hashes each feature's UTF-8 bytes through the same
  * [[H32Kernel]], so every bucket id — and every DuckDB oracle replay
  * from the persisted λ — is bit-identical.
  *
  * |result| = 2·|tokens|−1 for ≥1 token (0 for none) — the caller's
  * n_feats IS the array size. Null in → null out (callers coalesce).
  */
object DsirFeatBucketsKernel {
  def compute(s: UTF8String, buckets: Int): ArrayData = {
    val lower = s.toLowerCase.toString
    val n = lower.length
    val toks = new java.util.ArrayList[String](16)
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
        toks.add(lower.substring(runStart, i))
        runStart = -1
      }
      i += 1
    }
    val nTok = toks.size()
    if (nTok == 0) return new GenericArrayData(Array.empty[Int])
    val out = new Array[Int](2 * nTok - 1)
    var t = 0
    while (t < nTok) {
      val h = H32Kernel.h32(toks.get(t).getBytes(java.nio.charset.StandardCharsets.UTF_8))
      out(t) = (h % buckets).toInt + 1
      t += 1
    }
    var b = 0
    while (b < nTok - 1) {
      val bigram = toks.get(b) + " " + toks.get(b + 1)
      val h = H32Kernel.h32(bigram.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      out(nTok + b) = (h % buckets).toInt + 1
      b += 1
    }
    new GenericArrayData(out)
  }
}

case class DsirFeatBuckets(child: Expression, buckets: Int)
    extends UnaryExpression with ImplicitCastInputTypes {

  require(buckets > 0, s"buckets must be positive, got $buckets")

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "graft_dsir_feat_buckets"

  override def nullSafeEval(input: Any): Any =
    DsirFeatBucketsKernel.compute(input.asInstanceOf[UTF8String], buckets)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = org.apache.spark.sql.graft.DsirFeatBucketsKernel.compute($c, $buckets);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object DsirFeatBuckets {
  def featBuckets(text: Column, buckets: Int): Column =
    ExpressionUtils.column(DsirFeatBuckets(ExpressionUtils.expression(text), buckets))
}

/** Σ λ(b−1) over a 1-based bucket-id array against a plan-constant λ —
  * the DSIR weight fold (`aggregate(bs, 0L, (acc, b) => acc +
  * element_at(lamLit, b))`) as one native loop instead of an interpreted
  * per-element lambda with a boxed 4096-entry literal lookup. Long
  * overflow throws (Math.addExact — the ANSI behavior of the builtin
  * fold); |λ| ≤ ~25·10⁶ and features per doc are bounded, so an overflow
  * is a data pathology, kept loud.
  */
object SumLamKernel {
  /** Boxed return: a null bucket ELEMENT nulls the sum (the builtin
    * fold's `acc + element_at(lam, null)` behavior); the engine's own
    * feature arrays are containsNull=false, so the box never allocates
    * on the hot path (valueOf caches are beside the point — one box per
    * ROW, not per element).
    */
  def compute(bs: ArrayData, lam: Array[Long]): java.lang.Long = {
    val n = bs.numElements()
    var sum = 0L
    var i = 0
    while (i < n) {
      if (bs.isNullAt(i)) return null
      sum = Math.addExact(sum, lam(bs.getInt(i) - 1))
      i += 1
    }
    java.lang.Long.valueOf(sum)
  }
}

case class SumLam(child: Expression, lam: Seq[Long])
    extends UnaryExpression with ImplicitCastInputTypes {

  require(lam.nonEmpty, "lambda table must be nonempty")

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(IntegerType))
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_sum_lam"

  /** Null ELEMENTS null the sum even under a non-nullable array column —
    * the [[DotProduct]] nullability footnote applies verbatim (a wrong
    * `false` here would emit an assignment to a constant isNull slot and
    * silently de-optimize the stage).
    */
  override def nullable: Boolean = child.nullable || (child.dataType match {
    case ArrayType(_, containsNull) => containsNull
    case _ => true
  })

  @transient private lazy val lamArr = lam.toArray

  override def nullSafeEval(input: Any): Any =
    SumLamKernel.compute(input.asInstanceOf[ArrayData], lamArr)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val lamRef = ctx.addReferenceObj("lamTable", lamArr, "long[]")
    nullSafeCodeGen(ctx, ev, c => {
      val tmp = ctx.freshName("boxed")
      // the kernel boxes so a null bucket element can null the result;
      // only emit the isNull branch when the slot is a variable
      if (nullable)
        s"""
           |java.lang.Long $tmp = org.apache.spark.sql.graft.SumLamKernel.compute($c, $lamRef);
           |if ($tmp == null) { ${ev.isNull} = true; } else { ${ev.value} = $tmp.longValue(); }
         """.stripMargin
      else
        s"${ev.value} = org.apache.spark.sql.graft.SumLamKernel.compute($c, $lamRef).longValue();"
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SumLam {
  def sumLam(bs: Column, lam: Seq[Long]): Column =
    ExpressionUtils.column(SumLam(ExpressionUtils.expression(bs), lam))
}
