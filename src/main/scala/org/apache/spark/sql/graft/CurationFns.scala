package org.apache.spark.sql.graft

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.functions.size
import org.apache.spark.sql.classic.{ColumnNodeToExpressionConverter, ExpressionUtils}

import graft.ops.Text

/** SQL-surface pack for the curation primitives — the KSQL-style textual
  * path (`StreamRegistry.sql` CSAS/CTAS and plain `spark.sql`) gets the
  * same gates the DataFrame operators use:
  *
  *   graft_h32(s)          portable 32-bit md5 hash (the engine's sampling
  *                         / sharding / LSH hash — DuckDB-reproducible)
  *   graft_tokens(s)       the engine's tokenizer (lower, \\W+ split,
  *                         empties dropped)
  *   graft_token_count(s)  |graft_tokens(s)|
  *   graft_lang_pred(s)    marker-word language id, ties en>es>de>fr
  *   graft_cleanse(s)      HTML-strip / URL / e-mail redaction / squash
  *
  * Each builder COMPOSES the exact Column chains the operators run (no
  * parallel reimplementation — `Text.h32`/`tokens`/`langPredOf`/
  * `cleanseOf` are the single source of truth), so a SQL `WHERE
  * graft_lang_pred(text) = 'en'` makes the identical keep/drop calls as
  * `ops.Text.langId`. Everything stays built-in-expression codegen.
  *
  * Same `org.apache.spark.sql` packaging rationale as [[DotProduct]].
  */
object CurationFns {

  private def descriptor(name: String)(build: Column => Column)
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) =
    (FunctionIdentifier(name),
      new ExpressionInfo("graft.ops.Text", name),
      (children: Seq[Expression]) => {
        if (children.length != 1)
          throw org.apache.spark.sql.errors.QueryCompilationErrors.wrongNumArgsError(
            name, Seq(1), children.length)
        // eagerly lower the Column's node tree to a plain Catalyst tree
        // (UnresolvedFunction leaves and all) — a lazy ColumnNodeExpression
        // returned from a function builder would survive analysis and die
        // at codegen; the unresolved leaves of the CONVERTED tree are
        // re-resolved by the analyzer's normal fixpoint
        ColumnNodeToExpressionConverter(
          build(ExpressionUtils.column(children.head)).node)
      })

  val all: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    descriptor("graft_h32")(Text.h32(_)),
    descriptor("graft_tokens")(Text.tokens),
    descriptor("graft_token_count")(c => size(Text.tokens(c)).cast("long")),
    descriptor("graft_lang_pred")(Text.langPredOf),
    descriptor("graft_cleanse")(Text.cleanseOf))

  /** Runtime registration on an existing session. */
  def register(spark: SparkSession): Unit =
    all.foreach { case (id, info, builder) =>
      spark.sessionState.functionRegistry.registerFunction(id, info, builder)
    }
}
