package graft.api

import scala.collection.mutable

/** Hand-rolled tokenizer for the textual CSAS surface
  * (`CREATE STREAM name [WITH (k='v', ...)] AS SELECT ...;` — reference
  * entry point `KsqlContext.sql`, statement shapes from
  * `StreamsSelectAndProjectIntTest.java:174-344`).
  *
  * Replaces the earlier single-regex matcher, whose documented limits this
  * lifts: option VALUES may now contain `)`, commas, the literal text
  * `timestamp=`, and `''`-escaped quotes, because options are parsed
  * pair-by-pair instead of regex-searched as one blob. The SELECT body is
  * passed to Spark verbatim (minus one trailing `;`), so its own nested
  * parens/quotes need no handling here.
  */
private[api] object CsasParser {

  /** Parsed `CREATE STREAM|TABLE` statement: object name, lower-cased WITH
    * options, the SELECT text, and whether it declares a TABLE.
    */
  case class Csas(name: String, options: Map[String, String], select: String,
      table: Boolean = false)

  /** `Some(csas)` for a CREATE STREAM/TABLE statement, `None` for anything
    * else (pass those through to `spark.sql` — `CREATE TEMPORARY VIEW`
    * etc. are untouched because their next keyword is neither STREAM nor
    * TABLE-followed-by-AS-SELECT shape we own; see below). A statement that
    * starts with `CREATE STREAM`/`CREATE TABLE` but is malformed throws
    * `IllegalArgumentException` with the offending position.
    */
  def parse(statement: String): Option[Csas] = {
    require(statement != null, "null statement")
    val s = statement
    var i = 0

    def isIdentChar(c: Char) = c.isLetterOrDigit || c == '_'
    def ws(): Unit = while (i < s.length && s.charAt(i).isWhitespace) i += 1
    def keyword(k: String): Boolean = {
      ws()
      val hit = s.regionMatches(true, i, k, 0, k.length) &&
        (i + k.length >= s.length || !isIdentChar(s.charAt(i + k.length)))
      if (hit) i += k.length
      hit
    }
    def ident(): String = {
      ws()
      val start = i
      while (i < s.length && isIdentChar(s.charAt(i))) i += 1
      require(i > start, s"expected identifier at position $start in: $s")
      s.substring(start, i)
    }
    def expect(c: Char): Unit = {
      ws()
      require(i < s.length && s.charAt(i) == c,
        s"expected '$c' at position $i in: $s")
      i += 1
    }
    def peek(c: Char): Boolean = { ws(); i < s.length && s.charAt(i) == c }
    def stringLit(): String = {
      expect('\'')
      val sb = new StringBuilder
      while (true) {
        require(i < s.length, s"unterminated string literal in: $s")
        s.charAt(i) match {
          case '\'' if i + 1 < s.length && s.charAt(i + 1) == '\'' =>
            sb += '\''; i += 2 // SQL '' escape
          case '\'' => i += 1; return sb.toString
          case c => sb += c; i += 1
        }
      }
      sb.toString // unreachable
    }

    if (!keyword("CREATE")) return None
    val isTable =
      if (keyword("STREAM")) false
      else if (keyword("TABLE")) true
      else return None
    val name = ident()
    val options: Map[String, String] =
      if (keyword("WITH")) {
        expect('(')
        val m = mutable.LinkedHashMap[String, String]()
        // option keys may be dotted (kafka-config style: cleanup.policy) —
        // the old regex accepted-and-ignored those; the tokenizer must too
        def optionKey(): String = {
          val sb = new StringBuilder(ident())
          while (peek('.')) { i += 1; sb += '.'; sb ++= ident() }
          sb.toString
        }
        if (!peek(')')) {
          var more = true
          while (more) {
            val k = optionKey().toLowerCase
            expect('=')
            m(k) = stringLit()
            more = peek(',')
            if (more) i += 1
          }
        }
        expect(')')
        m.toMap
      } else Map.empty
    if (!keyword("AS")) {
      // CREATE TABLE without AS is Spark DDL (`CREATE TABLE t (...) USING
      // parquet`, `... USING x AS SELECT`) — not ours, pass it through
      if (isTable) return None
      throw new IllegalArgumentException(s"expected AS at position $i in: $s")
    }
    ws()
    var end = s.length
    while (end > i && s.charAt(end - 1).isWhitespace) end -= 1
    if (end > i && s.charAt(end - 1) == ';') {
      end -= 1
      while (end > i && s.charAt(end - 1).isWhitespace) end -= 1
    }
    val select = s.substring(i, end)
    require(select.regionMatches(true, 0, "SELECT", 0, 6),
      s"CSAS body must be a SELECT, got: '$select'")
    Some(Csas(name, options, select, isTable))
  }
}
