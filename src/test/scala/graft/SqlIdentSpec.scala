package graft

import org.scalatest.funsuite.AnyFunSuite

/** Identifier validation guarding the generated-SQL seams (JdbcSink,
  * JdbcIncrementingSource): plain/qualified identifiers pass, everything
  * injection-shaped is rejected up front.
  */
class SqlIdentSpec extends AnyFunSuite {

  test("valid identifiers pass through") {
    assert(SqlIdent.column("word") === "word")
    assert(SqlIdent.column("_cnt2") === "_cnt2")
    assert(SqlIdent.table("WORDCOUNT_OUTPUT") === "WORDCOUNT_OUTPUT")
    assert(SqlIdent.table("app.wordcount") === "app.wordcount")
    // subquery form is READ-side only (DSv2 source FROM clause)
    assert(SqlIdent.tableOrSubquery("(SELECT * FROM t)") === "(SELECT * FROM t)")
  }

  test("injection-shaped and reserved-unsafe names are rejected") {
    val bad = Seq("t; DROP TABLE x", "a b", "x--", "1x", "", "k = ? OR 1=1")
    bad.foreach { n =>
      intercept[IllegalArgumentException](SqlIdent.column(n))
      intercept[IllegalArgumentException](SqlIdent.table(n))
      intercept[IllegalArgumentException](SqlIdent.tableOrSubquery(n))
    }
    // dots are table-qualification, not column syntax
    intercept[IllegalArgumentException](SqlIdent.column("a.b"))
    // the WRITE-target validator must not accept paren-wrapped payloads —
    // "(t); DROP TABLE x; --()" is exactly the bypass shape
    intercept[IllegalArgumentException](SqlIdent.table("(t); DROP TABLE x; --()"))
    intercept[IllegalArgumentException](SqlIdent.table("(SELECT * FROM t)"))
  }

  test("subquery shape: balance + optional alias enforced, paren payloads rejected") {
    // the PostgreSQL-required aliased form passes
    assert(SqlIdent.tableOrSubquery("(SELECT * FROM t) t1") === "(SELECT * FROM t) t1")
    // nested parens balance
    assert(SqlIdent.tableOrSubquery("(SELECT a FROM (SELECT 1 a) s)")
      === "(SELECT a FROM (SELECT 1 a) s)")
    // parens inside a quoted literal don't count toward balance
    assert(SqlIdent.tableOrSubquery("(SELECT ')(' FROM t) q") === "(SELECT ')(' FROM t) q")
    // statement smuggled AFTER the closing paren — the old endsWith(")")
    // check waved this through
    intercept[IllegalArgumentException](
      SqlIdent.tableOrSubquery("(SELECT 1); DROP TABLE x; --()"))
    // unbalanced parens / quotes, multi-token trailer
    intercept[IllegalArgumentException](SqlIdent.tableOrSubquery("(SELECT 1"))
    intercept[IllegalArgumentException](SqlIdent.tableOrSubquery("(SELECT 1) x y"))
    intercept[IllegalArgumentException](SqlIdent.tableOrSubquery("(SELECT ''') t"))
  }
}
