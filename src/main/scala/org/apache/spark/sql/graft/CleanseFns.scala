package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** One-pass-per-stage corpus cleansing — the native kernel behind
  * [[graft.ops.Text.cleanseOf]] (and the SQL pack's `graft_cleanse`).
  *
  * The column form chained four `regexp_replace` passes, each paying
  * java.util.regex machinery plus a full string copy; measured
  * ~205 KB text/core-second at the 167×-chars corpus (37.8 s). This
  * kernel hand-implements the SAME four rewrites as plain char scans.
  *
  * EXACT-equivalence contract with the regex chain (spec-pinned in
  * TextOpsSpec on adversarial fixtures; the `text_cleanse` oracle pins
  * it corpus-wide against DuckDB's RE2):
  *
  *  1. `<[^>]*>` → `' '` — `[^>]*` cannot cross `'>'`, so every match is
  *     `'<'` to the NEXT `'>'`; a `'<'` with no closing `'>'` stays.
  *  2. `https?://[^\s]+` → `<URL>` — literal prefix search at every
  *     position (no boundary requirement: `xhttp://a` matches from the
  *     `h`), then greedy non-whitespace; `\s` is the ASCII class
  *     `[ \t\n\x0B\f\r]` in BOTH Java (no UNICODE flag) and RE2.
  *  3. `[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}` → `<EMAIL>` —
  *     local/domain classes exclude `'@'`, so greedy+backtrack reduces
  *     to: maximal local-char run immediately left of an `'@'`
  *     (nonempty), maximal domain-char run right of it, then the
  *     RIGHTMOST `'.'` inside that run followed by ≥2 letters; the match
  *     ends after the greedy letter run (which may stop before the
  *     domain run's end: `a@b.cc-x` → `<EMAIL>-x`). Leftmost-first,
  *     non-overlapping, scanning resumes after the match.
  *  4. `\s+` → `' '`, then trim.
  *
  * Stages run in order on the previous stage's output, exactly like the
  * chained regexes (a stripped tag's `' '` can terminate a URL match).
  */
object CleanseKernel {

  private def isSpace(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\u000B' || c == '\f' || c == '\r'

  private def isAlpha(c: Char): Boolean =
    (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z')

  private def isAlnum(c: Char): Boolean =
    isAlpha(c) || (c >= '0' && c <= '9')

  private def isLocalChar(c: Char): Boolean =
    isAlnum(c) || c == '.' || c == '_' || c == '%' || c == '+' || c == '-'

  private def isDomainChar(c: Char): Boolean =
    isAlnum(c) || c == '.' || c == '-'

  private def stripTags(s: String): String = {
    if (s.indexOf('<') < 0) return s
    val out = new java.lang.StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '<') {
        val close = s.indexOf('>', i + 1)
        if (close >= 0) { out.append(' '); i = close + 1 }
        else { out.append(c); i += 1 }
      } else { out.append(c); i += 1 }
    }
    out.toString
  }

  private def redactUrls(s: String): String = {
    var from = s.indexOf("http")
    if (from < 0) return s
    val out = new java.lang.StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      var matched = false
      if (s.charAt(i) == 'h' && s.startsWith("http", i)) {
        var j = i + 4
        if (j < s.length && s.charAt(j) == 's') j += 1
        if (s.startsWith("://", j) && j + 3 < s.length && !isSpace(s.charAt(j + 3))) {
          var k = j + 3
          while (k < s.length && !isSpace(s.charAt(k))) k += 1
          out.append("<URL>")
          i = k
          matched = true
        }
      }
      if (!matched) { out.append(s.charAt(i)); i += 1 }
    }
    out.toString
  }

  private def redactEmails(s: String): String = {
    if (s.indexOf('@') < 0) return s
    val out = new java.lang.StringBuilder(s.length)
    var i = 0 // start of the not-yet-emitted region
    var at = s.indexOf('@')
    while (at >= 0) {
      // maximal local run ending right before '@', clipped to the
      // unemitted region (an earlier match consumed everything before i)
      var ls = at
      while (ls > i && isLocalChar(s.charAt(ls - 1))) ls -= 1
      // maximal domain run after '@'
      var de = at + 1
      while (de < s.length && isDomainChar(s.charAt(de))) de += 1
      var matchEnd = -1
      if (ls < at && de > at + 1) {
        // rightmost '.' in (at+1, de) with >= 2 letters after it; the
        // greedy letter run may end before de
        var d = de - 1
        while (matchEnd < 0 && d > at + 1) {
          if (s.charAt(d) == '.') {
            var le = d + 1
            while (le < s.length && isAlpha(s.charAt(le))) le += 1
            if (le - (d + 1) >= 2) matchEnd = le
          }
          d -= 1
        }
      }
      if (matchEnd > 0) {
        out.append(s, i, ls).append("<EMAIL>")
        i = matchEnd
        at = s.indexOf('@', matchEnd)
      } else {
        at = s.indexOf('@', at + 1)
      }
    }
    out.append(s, i, s.length)
    out.toString
  }

  private def squashTrim(s: String): String = {
    val out = new java.lang.StringBuilder(s.length)
    var i = 0
    var pendingSpace = false
    while (i < s.length) {
      val c = s.charAt(i)
      if (isSpace(c)) { pendingSpace = out.length > 0 } // leading ws drops
      else {
        if (pendingSpace) { out.append(' '); pendingSpace = false }
        out.append(c)
      }
      i += 1
    }
    out.toString // trailing ws never appended
  }

  def cleanse(s: UTF8String): UTF8String =
    UTF8String.fromString(
      squashTrim(redactEmails(redactUrls(stripTags(s.toString)))))
}

case class CleanseText(child: Expression)
    extends UnaryExpression with ImplicitCastInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = StringType
  override def prettyName: String = "graft_cleanse_kernel"

  override def nullSafeEval(input: Any): Any =
    CleanseKernel.cleanse(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = org.apache.spark.sql.graft.CleanseKernel.cleanse($c);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object CleanseFns {
  def cleanseText(text: Column): Column =
    ExpressionUtils.column(CleanseText(ExpressionUtils.expression(text)))
}
