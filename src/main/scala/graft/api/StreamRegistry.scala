package graft.api

import scala.collection.mutable
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** One registered stream/table: the KSQL metastore entry analogue.
  *
  * @param df      the (batch or streaming) DataFrame, WITH pseudo-columns
  * @param keyCol  source column the ROWKEY pseudo-column was derived from
  * @param timeCol source column the ROWTIME pseudo-column was derived from
  */
case class StreamDef(df: DataFrame, keyCol: Option[String], timeCol: Option[String])

/** Stream registry + CSAS surface — the Spark-first re-expression of KSQL's
  * metastore and `CREATE STREAM ... AS SELECT` (reference entry point:
  * `KsqlContext.sql`, exercised at
  * `StreamsSelectAndProjectIntTest.java:174-344`).
  *
  * Design: a registered stream is a temp view whose schema always carries the
  * KSQL pseudo-columns `ROWKEY` (record key) and `ROWTIME` (event time as
  * epoch millis, reference `ConnectSourceConsumer.java:270-276`), so SQL over
  * the view can select/alias/filter them like any column (P6-P9). Works
  * identically for batch and streaming DataFrames — Catalyst plans are
  * mode-agnostic, which is what lets the driver's DuckDB oracle check the
  * same pipelines in batch.
  *
  * Scale note: pseudo-columns are pure per-row projections (no shuffle); a
  * CSAS is `spark.sql` over the views, so Catalyst pushdown/pruning applies
  * through the registry unchanged.
  */
class StreamRegistry(spark: SparkSession) {
  private val defs = mutable.Map[String, StreamDef]()

  /** Register a stream with explicit key/time columns; projects ROWKEY and
    * ROWTIME pseudo-columns (epoch-ms long, KSQL's ROWTIME type).
    */
  def createStream(
      name: String,
      df: DataFrame,
      keyCol: Option[String] = None,
      timeCol: Option[String] = None,
      timeIsEpochMs: Boolean = false): DataFrame = {
    val rowkey: Column = keyCol.map(col).getOrElse(lit(null))
    val rowtime: Column = timeCol match {
      case Some(t) if timeIsEpochMs => col(t).cast("long")
      // parquet ms-timestamps read as TIMESTAMP_NTZ; session TZ is UTC so
      // the cast to TIMESTAMP is value-preserving and unix_millis applies
      case Some(t)                  => unix_millis(col(t).cast("timestamp"))
      case None                     => lit(null).cast("long")
    }
    val out = df
      .withColumn("ROWKEY", rowkey)
      .withColumn("ROWTIME", rowtime)
    out.createOrReplaceTempView(name)
    defs(name) = StreamDef(out, keyCol, timeCol)
    out
  }

  /** CSAS: `CREATE STREAM name AS <sql>` with optional timestamp
    * reassignment (`WITH (timestamp='col')`, P12 — reference
    * `StreamsSelectAndProjectIntTest.java:174-209`): the derived stream's
    * ROWTIME is re-derived from `timestampCol` (an epoch-ms bigint column of
    * the result, as in KSQL), replacing the inherited one.
    */
  def createStreamAs(name: String, sql: String, timestampCol: Option[String] = None): DataFrame = {
    val result = spark.sql(sql)
    val out = timestampCol match {
      case Some(tc) => result.withColumn("ROWTIME", col(tc).cast("long"))
      case None     => result
    }
    out.createOrReplaceTempView(name)
    val key = if (out.columns.contains("ROWKEY")) Some("ROWKEY") else None
    defs(name) = StreamDef(out, key, timestampCol)
    out
  }

  /** CTAS: `CREATE TABLE name AS <sql>` — the KSQL table analogue. An
    * aggregated SELECT is already a changelog table (one row per grouping
    * key) and registers as-is; a stream-shaped result (carries ROWKEY +
    * ROWTIME) materializes as latest-row-per-key by ROWTIME — the KTable
    * compaction contract (same semantics as the a3_latest_per_key op),
    * ROWTIME ties broken by full-row ordering. The same max_by aggregation
    * runs in update mode over a streaming frame.
    */
  def createTableAs(name: String, sql: String, timestampCol: Option[String] = None): DataFrame = {
    val result = spark.sql(sql)
    val withTs = timestampCol match {
      case Some(tc) => result.withColumn("ROWTIME", col(tc).cast("long"))
      case None     => result
    }
    val cols = withTs.columns
    val out =
      if (cols.contains("ROWKEY") && cols.contains("ROWTIME")) {
        val rest = cols.filterNot(_ == "ROWKEY").toSeq
        val ord = struct((col("ROWTIME") +: rest.filterNot(_ == "ROWTIME").map(col)): _*)
        withTs.groupBy("ROWKEY")
          .agg(max_by(struct(rest.map(col): _*), ord).as("__t"))
          .select(col("ROWKEY") +: rest.map(c => col(s"__t.$c").as(c)): _*)
      } else withTs
    out.createOrReplaceTempView(name)
    defs(name) = StreamDef(out,
      if (out.columns.contains("ROWKEY")) Some("ROWKEY") else None, timestampCol)
    out
  }

  def stream(name: String): StreamDef = defs(name)
  def names: Seq[String] = defs.keys.toSeq.sorted

  /** Textual entry point — the KSQL statement surface
    * (`ksqlContext.sql(...)`, reference
    * `StreamsSelectAndProjectIntTest.java:174-344`):
    * `CREATE STREAM name [WITH (timestamp='col', ...)] AS SELECT ...;`
    * Other WITH options (kafka_topic, value_format) belong to the
    * source/sink adapters and are accepted-and-ignored here. Non-CSAS
    * statements pass through to `spark.sql`.
    *
    * Statements are tokenized by [[CsasParser]] (quoted literals, `''`
    * escapes, per-pair options — not a regex), so option values may contain
    * `)`/commas/`timestamp=` text freely; a malformed CREATE STREAM fails
    * here with the offending position instead of confusing Spark's parser.
    */
  def sql(statement: String): DataFrame = CsasParser.parse(statement) match {
    case Some(c) if c.table => createTableAs(c.name, c.select, c.options.get("timestamp"))
    case Some(c) => createStreamAs(c.name, c.select, c.options.get("timestamp"))
    case None => spark.sql(statement)
  }
}
