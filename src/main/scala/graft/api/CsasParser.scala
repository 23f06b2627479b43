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

  sealed trait Statement

  /** Parsed `CREATE STREAM|TABLE` statement: object name, lower-cased WITH
    * options, the SELECT text, and whether it declares a TABLE.
    */
  case class Csas(name: String, options: Map[String, String], select: String,
      table: Boolean = false) extends Statement

  /** Parsed explicit-schema source DDL
    * (`CREATE STREAM s (COL TYPE, ...) WITH (kafka_topic='t',
    * value_format='JSON', key='col');` — reference
    * `DatabaseSelectAndProjectIntTest.java:269-281`,
    * `StreamsSelectAndProjectIntTest.java:330-344` incl.
    * `map<varchar, double>` column types): object name, declared columns
    * as (name, KSQL type text), lower-cased WITH options.
    */
  case class SourceDdl(name: String, columns: Seq[(String, String)],
      options: Map[String, String]) extends Statement

  /** `Some(csas)` for a CREATE STREAM/TABLE statement, `None` for anything
    * else (pass those through to `spark.sql` — `CREATE TEMPORARY VIEW`
    * etc. are untouched because their next keyword is neither STREAM nor
    * TABLE-followed-by-AS-SELECT shape we own; see below). A statement that
    * starts with `CREATE STREAM`/`CREATE TABLE` but is malformed throws
    * `IllegalArgumentException` with the offending position.
    */
  def parse(statement: String): Option[Statement] = {
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

    /** KSQL type text up to a top-level ',' or ')': generics nest via
      * '<'/'>' (`map<varchar, double>` carries a comma inside).
      */
    def typeText(): String = {
      ws()
      val start = i
      var depth = 0
      while (i < s.length &&
          (depth > 0 || (s.charAt(i) != ',' && s.charAt(i) != ')'))) {
        s.charAt(i) match {
          case '<' => depth += 1
          case '>' => depth -= 1
          case _ => ()
        }
        i += 1
      }
      val t = s.substring(start, i).trim
      require(t.nonEmpty, s"expected column type at position $start in: $s")
      t
    }

    // explicit-schema source DDL: CREATE STREAM name (col type, ...) WITH (...)
    // — only the STREAM form; CREATE TABLE t (...) is Spark DDL, not ours
    if (!isTable && peek('(')) {
      expect('(')
      val cols = mutable.ArrayBuffer[(String, String)]()
      var more = true
      while (more) {
        val cn = ident()
        cols += cn -> typeText()
        more = peek(',')
        if (more) i += 1
      }
      expect(')')
      val options: Map[String, String] =
        if (keyword("WITH")) {
          expect('(')
          val m = mutable.LinkedHashMap[String, String]()
          if (!peek(')')) {
            var more2 = true
            while (more2) {
              // dotted option keys (kafka-config style), same as the CSAS path
              val kb = new StringBuilder(ident())
              while (peek('.')) { i += 1; kb += '.'; kb ++= ident() }
              expect('=')
              m(kb.toString.toLowerCase) = stringLit()
              more2 = peek(',')
              if (more2) i += 1
            }
          }
          expect(')')
          m.toMap
        } else Map.empty
      ws()
      if (i < s.length && s.charAt(i) == ';') i += 1
      ws()
      require(i >= s.length,
        s"unexpected trailing text at position $i in: $s")
      return Some(SourceDdl(name, cols.toSeq, options))
    }

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
