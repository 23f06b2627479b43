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
}
