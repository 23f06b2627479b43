package graft

/** SQL identifier validation for the JDBC source/sink config surface.
  *
  * Table/column names arrive as connector options and are interpolated into
  * generated SQL (same trusted-config stance as the reference's JDBC
  * connector, `DatabaseWordCount.java:94-103`), but validating them closes
  * the reserved-word/injection foot-gun the interpolation would otherwise
  * leave open: a name that isn't a plain (optionally schema-qualified)
  * identifier is rejected up front with a clear error instead of producing
  * broken or attacker-shaped SQL.
  */
object SqlIdent {

  private val IdentRe = "[A-Za-z_][A-Za-z0-9_]*".r
  private val QualifiedRe = s"$IdentRe(\\.$IdentRe)*".r

  /** Validate a column name (plain identifier). */
  def column(name: String): String = {
    require(name != null && IdentRe.matches(name),
      s"not a valid SQL column identifier: '$name'")
    name
  }

  /** Validate a WRITE-target table name: plain schema-qualified identifier
    * only — the INSERT/DELETE targets in the sink can never legally be a
    * subquery, so nothing paren-wrapped gets through.
    */
  def table(name: String): String = {
    require(name != null && QualifiedRe.matches(name),
      s"not a valid SQL table identifier: '$name'")
    name
  }

  /** Validate a READ-side table reference: schema-qualified identifier, or
    * a parenthesized subquery `(SELECT ...)` with an optional trailing
    * alias (`(SELECT ...) t` — the form PostgreSQL requires; Derby accepts
    * the bare form). The subquery TEXT stays trusted config, like the
    * reference connector's `query` option — the check here guarantees only
    * the SHAPE: parens balance (ignoring anything single-quoted), the
    * leading paren closes at the end of the subquery, and whatever follows
    * is a plain alias. It is a foot-gun guard, not a SQL parser.
    */
  def tableOrSubquery(name: String): String = {
    require(name != null, "null table reference")
    val t = name.trim
    if (QualifiedRe.matches(t)) return name
    require(t.startsWith("("), s"not a valid SQL table identifier or (subquery): '$name'")
    var depth = 0
    var inQuote = false
    var close = -1
    t.indices.foreach { i =>
      t.charAt(i) match {
        case '\'' => inQuote = !inQuote
        case '(' if !inQuote => depth += 1
        case ')' if !inQuote =>
          depth -= 1
          require(depth >= 0, s"unbalanced parens in subquery: '$name'")
          if (depth == 0 && close < 0) close = i
        case _ => ()
      }
    }
    require(depth == 0 && !inQuote, s"unbalanced parens/quotes in subquery: '$name'")
    val rest = t.substring(close + 1).trim
    require(rest.isEmpty || IdentRe.matches(rest),
      s"text after subquery must be a plain alias, got: '$rest'")
    name
  }
}
