package graft.api

import org.apache.spark.sql.DataFrame

/** Topology-composition helpers (SURVEY §2.1 S10/S11).
  *
  *  - [[smtChain]]: the Single-Message-Transform chain — Connect applies an
  *    ordered list of record transforms where a null result drops the
  *    record (`ConnectSourceConsumer.java:259-264`). In Spark a transform
  *    is `DataFrame => DataFrame` (projection/filter), record-dropping is a
  *    filter stage, and the chain is function composition — Catalyst fuses
  *    the whole chain into one stage (no per-record dispatch overhead).
  *  - [[unionSources]]: per-topic routing / merged consumption
  *    (`WrappedConsumer.poll:103-115` merges Kafka + Connect sources) —
  *    `unionByName` across sources, tolerating schema drift via
  *    allowMissingColumns.
  */
object Topology {
  type Transform = DataFrame => DataFrame

  /** Ordered transform chain; identity when empty. */
  def smtChain(transforms: Transform*): Transform =
    df => transforms.foldLeft(df)((d, f) => f(d))

  /** Union of N sources by column name (missing columns → null). Works for
    * batch and streaming frames alike.
    */
  def unionSources(dfs: Seq[DataFrame]): DataFrame = {
    require(dfs.nonEmpty, "unionSources needs at least one source")
    dfs.reduce(_.unionByName(_, allowMissingColumns = true))
  }
}
