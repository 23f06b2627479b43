package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Per-row MinHash signature mins over a shingle-base array — the r21
  * replacement for the explode → groupBy(doc) aggregation in
  * [[graft.ops.Dedup.minhashSignatures]].
  *
  * The aggregation form shuffled k longs per document (an Exchange on
  * EVERY LSH pipeline: signatures, bands, candidate pairs, kept sets,
  * cross-corpus gates, the incremental index) purely to reassemble what
  * is a per-row quantity; the historical reason was that the nested
  * per-row column form (`array_min(transform(bases, ...))` per seed)
  * inlined the whole base expression k×bands times and paid interpreted
  * HOF dispatch per element. This kernel computes every seed's min in
  * one native pass over the base array, so the per-row form wins on both
  * counts: zero exchanges AND no interpreted lambdas.
  *
  * Semantics (spec-pinned against the aggregation reference form): per
  * seed s, min over non-null bases of (base·a_s + c_s) & (2³²−1) — null
  * bases are skipped exactly like SQL `min` (and like `array_min` in the
  * streaming twin); an all-null or empty base array yields null for
  * every seed. a_s < 2²⁰ and base < 2³², so the product stays < 2⁵² —
  * no overflow, the same longs as the Column arithmetic.
  */
object SeedMinsKernel {
  private val Mask = 0xFFFFFFFFL

  def compute(bases: ArrayData, as: Array[Long], cs: Array[Long]): ArrayData = {
    val k = as.length
    val out = new Array[Any](k)
    val n = bases.numElements()
    var s = 0
    while (s < k) {
      val a = as(s)
      val c = cs(s)
      var m = Long.MaxValue
      var any = false
      var i = 0
      while (i < n) {
        if (!bases.isNullAt(i)) {
          val v = (bases.getLong(i) * a + c) & Mask
          if (v < m) m = v
          any = true
        }
        i += 1
      }
      out(s) = if (any) java.lang.Long.valueOf(m) else null
      s += 1
    }
    new GenericArrayData(out)
  }
}

case class SeedMins(child: Expression, as: Seq[Long], cs: Seq[Long])
    extends UnaryExpression with ImplicitCastInputTypes {

  require(as.nonEmpty && as.length == cs.length,
    s"seed constant arrays must be equal-length and nonempty: ${as.length}/${cs.length}")

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(LongType))
  override def dataType: DataType = ArrayType(LongType, containsNull = true)
  override def prettyName: String = "graft_seed_mins"

  @transient private lazy val aArr = as.toArray
  @transient private lazy val cArr = cs.toArray

  override def nullSafeEval(input: Any): Any =
    SeedMinsKernel.compute(input.asInstanceOf[ArrayData], aArr, cArr)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val aRef = ctx.addReferenceObj("seedA", aArr, "long[]")
    val cRef = ctx.addReferenceObj("seedC", cArr, "long[]")
    nullSafeCodeGen(ctx, ev, in =>
      s"${ev.value} = org.apache.spark.sql.graft.SeedMinsKernel.compute($in, $aRef, $cRef);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SeedMins {
  def seedMins(bases: Column, consts: Seq[(Long, Long)]): Column =
    ExpressionUtils.column(SeedMins(ExpressionUtils.expression(bases),
      consts.map(_._1), consts.map(_._2)))
}

/** Distinct 3-gram word shingle STRINGS of a document in first-occurrence
  * order — the native twin of
  * `array_distinct(Dedup.shinglesOfTokens(Text.tokens(text)))`, the
  * verification-set producer on every exact-Jaccard dedup path (pair
  * verify, kept sets, cross-corpus gates, the incremental index).
  *
  * The column form pays an interpreted `filter` HOF over the split
  * tokens plus an interpreted `transform` HOF with three `element_at`
  * calls and a `concat_ws` per shingle. This kernel tokenizes the
  * lowered text in one scan (maximal `\w+` runs — the same tokenizer
  * contract as [[ShingleBasesKernel]], spec-pinned) and assembles each
  * distinct shingle once.
  *
  * Contract (spec-pinned against the column reference form):
  *  - ≥ n tokens: shingle i = tokens i..i+n−1 joined by single spaces,
  *    de-duplicated keeping FIRST occurrence (array_distinct semantics);
  *  - < n tokens: ONE whole-doc shingle (all tokens space-joined; the
  *    empty document yields [""]);
  *  - null text is the CALLER's branch (the old tree propagated null
  *    through size()/array_join into array(NULL); callers keep that
  *    exact behavior with an explicit isNull branch).
  */
object DistinctShinglesKernel {
  def compute(s: UTF8String, n: Int): ArrayData = {
    val lower = s.toLowerCase.toString
    val len = lower.length
    val toks = new java.util.ArrayList[String](16)
    var runStart = -1
    var i = 0
    while (i <= len) {
      val w = i < len && {
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
    val seen = new java.util.LinkedHashSet[String]()
    if (nTok >= n) {
      var p = 0
      while (p + n <= nTok) {
        val sb = new java.lang.StringBuilder(toks.get(p))
        var j = 1
        while (j < n) { sb.append(' ').append(toks.get(p + j)); j += 1 }
        seen.add(sb.toString)
        p += 1
      }
    } else {
      val sb = new java.lang.StringBuilder()
      var j = 0
      while (j < nTok) {
        if (j > 0) sb.append(' ')
        sb.append(toks.get(j))
        j += 1
      }
      seen.add(sb.toString)
    }
    val out = new Array[Any](seen.size())
    val it = seen.iterator()
    var k = 0
    while (it.hasNext) { out(k) = UTF8String.fromString(it.next()); k += 1 }
    new GenericArrayData(out)
  }
}

case class DistinctShingles(child: Expression, n: Int)
    extends UnaryExpression with ImplicitCastInputTypes {

  require(n >= 1, s"shingle width n=$n must be >= 1")

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_distinct_shingles"

  override def nullSafeEval(input: Any): Any =
    DistinctShinglesKernel.compute(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = org.apache.spark.sql.graft.DistinctShinglesKernel.compute($c, $n);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object DistinctShingles {
  def distinctShingles(text: Column, n: Int = 3): Column =
    ExpressionUtils.column(DistinctShingles(ExpressionUtils.expression(text), n))
}

/** The HASHED verification-set kernel (r22):
  * `array_distinct(transform(graft_distinct_shingles(text), xxhash64))`
  * in one native pass — the incremental text index's hashedShingles
  * layout still paid an interpreted per-shingle `transform` on every
  * batch staging and probe row after r21 nativized the string form.
  * Hashes are Spark's `xxhash64` exactly (XXH64 over the shingle's
  * UTF-8 bytes, seed 42), and the re-distinct after hashing keeps FIRST
  * occurrence — a collision merges two shingles, which only ever RAISES
  * a pair's Jaccard (the SubstrDedup hashed discipline). Null text stays
  * the caller's branch, like [[DistinctShinglesKernel]].
  */
object HashedDistinctShinglesKernel {
  def compute(s: UTF8String, n: Int): ArrayData = {
    val strs = DistinctShinglesKernel.compute(s, n)
    val m = strs.numElements()
    val seen = new java.util.LinkedHashSet[java.lang.Long]()
    var i = 0
    while (i < m) {
      val u = strs.getUTF8String(i)
      seen.add(java.lang.Long.valueOf(
        org.apache.spark.sql.catalyst.expressions.XXH64.hashUnsafeBytes(
          u.getBaseObject, u.getBaseOffset, u.numBytes, 42L)))
      i += 1
    }
    val out = new Array[Any](seen.size())
    val it = seen.iterator()
    var k = 0
    while (it.hasNext) { out(k) = it.next().longValue(); k += 1 }
    new GenericArrayData(out)
  }
}

case class HashedDistinctShingles(child: Expression, n: Int)
    extends UnaryExpression with ImplicitCastInputTypes {

  require(n >= 1, s"shingle width n=$n must be >= 1")

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_hashed_distinct_shingles"

  override def nullSafeEval(input: Any): Any =
    HashedDistinctShinglesKernel.compute(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = org.apache.spark.sql.graft.HashedDistinctShinglesKernel.compute($c, $n);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object HashedDistinctShingles {
  def hashedDistinctShingles(text: Column, n: Int = 3): Column =
    ExpressionUtils.column(HashedDistinctShingles(ExpressionUtils.expression(text), n))
}
