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
    * a parenthesized-subquery alias (the DSv2 source documents that form;
    * subqueries remain trusted config, like the reference connector's
    * `query` option).
    */
  def tableOrSubquery(name: String): String = {
    require(name != null &&
      (QualifiedRe.matches(name) || (name.startsWith("(") && name.endsWith(")"))),
      s"not a valid SQL table identifier or (subquery): '$name'")
    name
  }
}
