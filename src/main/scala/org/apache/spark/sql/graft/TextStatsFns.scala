package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, DataType, IntegerType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** One-pass text quality statistics — the native kernel behind
  * [[graft.ops.Text.qualityScore]].
  *
  * The column formulation needed FOUR independent scans per row, each
  * with its own regex machinery and per-row allocations: `split(lower(t),
  * "\\W+")` (token array), `regexp_extract_all(lower(t), "\\b(w1|…|wN)\\b")`
  * (match array against a ~N-alternative pattern — Java regex tries each
  * alternative at every boundary, the dominant cost), and two
  * `regexp_replace` copies for punctuation / word-char counts. Measured
  * at the 100×-perturbed corpus (248 M chars): 112 s — ~280 KB of text
  * per core-second. This kernel computes all four counts in ONE linear
  * char scan with a hash-set token lookup and no per-row allocation
  * beyond the token substrings probed against the set.
  *
  * Exact-equivalence contract with the replaced columns (pinned by the
  * `text_quality_score` oracle and TextOpsSpec's adversarial shapes):
  *  - tokens are maximal `\w+` runs of `lower(text)` — `\w` is Java's
  *    ASCII class `[0-9A-Za-z_]`, so runs over UTF-16 units and runs
  *    over code points coincide (word chars are all BMP/ASCII);
  *  - n_stop counts tokens ∈ the marker set, which equals the
  *    `\b(alternation)\b` match count because markers are pure-`\w`
  *    strings (no `\b` exists inside a `\w+` run);
  *  - n_punct counts `[.,;:!?]` chars (lowercasing never alters them);
  *  - n_wordchars counts `\w` chars — every `\w` char lies in some run,
  *    so it equals the summed token length;
  *  - null text → null struct (callers keep their when/otherwise
  *    scaffolding, so downstream null semantics are unchanged).
  */
object TextStatsKernel {

  private def isWordChar(c: Char): Boolean =
    c == '_' || (c >= '0' && c <= '9') || (c >= 'a' && c <= 'z') ||
      (c >= 'A' && c <= 'Z')

  def compute(s: UTF8String, stop: java.util.HashSet[String]): InternalRow = {
    val lower = s.toLowerCase.toString
    val n = lower.length
    var nTok = 0
    var nStop = 0
    var nPunct = 0
    var nWord = 0
    var runStart = -1
    var i = 0
    while (i <= n) {
      val w = i < n && isWordChar(lower.charAt(i))
      if (w) {
        if (runStart < 0) runStart = i
      } else {
        if (runStart >= 0) {
          nTok += 1
          nWord += i - runStart
          if (stop.contains(lower.substring(runStart, i))) nStop += 1
          runStart = -1
        }
        if (i < n) {
          val c = lower.charAt(i)
          if (c == '.' || c == ',' || c == ';' || c == ':' || c == '!' ||
            c == '?') nPunct += 1
        }
      }
      i += 1
    }
    new GenericInternalRow(Array[Any](nTok, nStop, nPunct, nWord))
  }
}

case class TextStats(child: Expression, stopwords: Seq[String])
    extends UnaryExpression with ImplicitCastInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)

  override def dataType: DataType = StructType(Seq(
    StructField("n_tokens", IntegerType, nullable = false),
    StructField("n_stop", IntegerType, nullable = false),
    StructField("n_punct", IntegerType, nullable = false),
    StructField("n_wordchars", IntegerType, nullable = false)))

  override def prettyName: String = "graft_text_stats"

  @transient private lazy val stopSet: java.util.HashSet[String] = {
    val h = new java.util.HashSet[String](stopwords.size * 2)
    stopwords.foreach(w => h.add(w))
    h
  }

  override def nullSafeEval(input: Any): Any =
    TextStatsKernel.compute(input.asInstanceOf[UTF8String], stopSet)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("stopSet", stopSet, "java.util.HashSet")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = org.apache.spark.sql.graft.TextStatsKernel.compute($c, $ref);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** One-pass per-language marker-token counts — the native kernel behind
  * [[graft.ops.Text.langId]] / `withLangPred` / `graft_lang_pred`.
  *
  * Replaces either the shared `\b(union-alternation)\b` extract_all (the
  * DataFrame staging path) or one alternation scan PER LANGUAGE (the SQL
  * pack's inline form) with a single char scan: each token is looked up
  * once in a token → language-bitmask map, so a token claimed by several
  * languages still counts for each (exactly the per-match set-membership
  * the HOF filters computed). Field order = the caller's language order.
  */
object MarkerCountsKernel {
  def compute(s: UTF8String, dict: java.util.HashMap[String, Integer],
      nLangs: Int): InternalRow = {
    val lower = s.toLowerCase.toString
    val n = lower.length
    val counts = new Array[Int](nLangs)
    var runStart = -1
    var i = 0
    while (i <= n) {
      val w = i < n && (lower.charAt(i) match {
        case c => c == '_' || (c >= '0' && c <= '9') ||
          (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z')
      })
      if (w) {
        if (runStart < 0) runStart = i
      } else if (runStart >= 0) {
        val mask = dict.get(lower.substring(runStart, i))
        if (mask != null) {
          var m = mask.intValue()
          var l = 0
          while (m != 0) {
            if ((m & 1) != 0) counts(l) += 1
            m >>>= 1
            l += 1
          }
        }
        runStart = -1
      }
      i += 1
    }
    new GenericInternalRow(counts.map(c => c: Any))
  }
}

case class MarkerCounts(child: Expression, langs: Seq[(String, Seq[String])])
    extends UnaryExpression with ImplicitCastInputTypes {

  require(langs.size <= 32, "bitmask dictionary supports at most 32 languages")

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)

  override def dataType: DataType = StructType(
    langs.map { case (l, _) => StructField(s"n_$l", IntegerType, nullable = false) })

  override def prettyName: String = "graft_marker_counts"

  @transient private lazy val dict: java.util.HashMap[String, Integer] = {
    val h = new java.util.HashMap[String, Integer]()
    langs.zipWithIndex.foreach { case ((_, words), i) =>
      words.foreach { w =>
        val prev = h.get(w)
        h.put(w, Integer.valueOf((if (prev == null) 0 else prev.intValue()) | (1 << i)))
      }
    }
    h
  }

  override def nullSafeEval(input: Any): Any =
    MarkerCountsKernel.compute(input.asInstanceOf[UTF8String], dict, langs.size)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("markerDict", dict, "java.util.HashMap")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = org.apache.spark.sql.graft.MarkerCountsKernel.compute($c, $ref, ${langs.size});")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** One-pass per-document repetition statistics — the native kernel behind
  * [[graft.ops.Text.repetitionStats]].
  *
  * The column form was a SHUFFLE MISTAKE at scale: it exploded the corpus
  * to one row per (doc, token) — ~80× the row count — and ran a
  * groupBy(doc, token) exchange to compute counts that are strictly
  * per-document, plus an interpreted `transform(sequence(...))` HOF to
  * build every adjacent-pair string into an array. All five statistics
  * (token total, distinct tokens, top token count, 2-gram total/distinct)
  * come out of one char scan with a per-row count map; at 100 TB this is
  * the difference between a 40-billion-row shuffle and none at all.
  * Tokens are maximal `\w+` runs of `lower(text)` — identical to the
  * split semantics it replaces (TextOpsSpec pins the equivalence).
  */
object TokenRepStatsKernel {
  def compute(s: UTF8String): InternalRow = {
    val lower = s.toLowerCase.toString
    val n = lower.length
    val counts = new java.util.HashMap[String, Integer]()
    val grams = new java.util.HashSet[String]()
    var nTok = 0
    var nGrams = 0
    var prev: String = null
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
        nTok += 1
        val c = counts.get(tok)
        counts.put(tok, Integer.valueOf(if (c == null) 1 else c.intValue() + 1))
        if (prev != null) { nGrams += 1; grams.add(prev + " " + tok) }
        prev = tok
        runStart = -1
      }
      i += 1
    }
    var top = 0
    val it = counts.values().iterator()
    while (it.hasNext) { val v = it.next().intValue(); if (v > top) top = v }
    new GenericInternalRow(Array[Any](nTok, counts.size(), top, nGrams, grams.size()))
  }
}

case class TokenRepStats(child: Expression)
    extends UnaryExpression with ImplicitCastInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)

  override def dataType: DataType = StructType(Seq(
    StructField("n_tok", IntegerType, nullable = false),
    StructField("n_distinct", IntegerType, nullable = false),
    StructField("top_cnt", IntegerType, nullable = false),
    StructField("n_2grams", IntegerType, nullable = false),
    StructField("n_2gram_distinct", IntegerType, nullable = false)))

  override def prettyName: String = "graft_token_rep_stats"

  override def nullSafeEval(input: Any): Any =
    TokenRepStatsKernel.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = org.apache.spark.sql.graft.TokenRepStatsKernel.compute($c);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object TextStatsFns {
  def textStats(text: Column, stopwords: Seq[String]): Column =
    ExpressionUtils.column(TextStats(ExpressionUtils.expression(text), stopwords))

  def markerCounts(text: Column, langs: Seq[(String, Seq[String])]): Column =
    ExpressionUtils.column(MarkerCounts(ExpressionUtils.expression(text), langs))

  def tokenRepStats(text: Column): Column =
    ExpressionUtils.column(TokenRepStats(ExpressionUtils.expression(text)))
}
