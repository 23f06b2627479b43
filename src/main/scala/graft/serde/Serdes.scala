package graft.serde

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Serde matrix (SURVEY §1.3, M0): the Kafka Connect converter surface
  * re-expressed as columnar codecs.
  *
  *  - JSON with embedded schema: Connect's `JsonConverter` with
  *    `schemas.enable=true` wraps every payload as
  *    `{"schema": {...}, "payload": {...}}` (reference `JsonSerde.java:8-39`,
  *    toggled at `DatabaseWordCount.java:83-88`).
  *  - Plain JSON (`schemas.enable=false`): bare payload.
  *  - Delimited/CSV: reference `IntegrationTestHarness.java:344-345,361-362`.
  *
  * All codecs are built from codegen'd functions (`to_json`/`from_json`/
  * `split`/`concat_ws`) — per-row narrow transforms.
  */
object Serdes {

  /** Connect JSON schema descriptor for a Spark type (the `"schema"` half of
    * the envelope; names per Connect's JsonSchema: int8..int64, float,
    * double, boolean, string, bytes, array, map, struct).
    */
  def connectSchemaJson(dt: DataType, optional: Boolean = false, field: Option[String] = None): String = {
    val f = field.map(n => s""","field":"${n}"""").getOrElse("")
    dt match {
      case ByteType => s"""{"type":"int8","optional":$optional$f}"""
      case ShortType => s"""{"type":"int16","optional":$optional$f}"""
      case IntegerType => s"""{"type":"int32","optional":$optional$f}"""
      case LongType => s"""{"type":"int64","optional":$optional$f}"""
      case FloatType => s"""{"type":"float","optional":$optional$f}"""
      case DoubleType => s"""{"type":"double","optional":$optional$f}"""
      case BooleanType => s"""{"type":"boolean","optional":$optional$f}"""
      case StringType => s"""{"type":"string","optional":$optional$f}"""
      case BinaryType => s"""{"type":"bytes","optional":$optional$f}"""
      case ArrayType(et, cn) =>
        s"""{"type":"array","items":${connectSchemaJson(et, cn)},"optional":$optional$f}"""
      case MapType(kt, vt, cn) =>
        s"""{"type":"map","keys":${connectSchemaJson(kt)},"values":${connectSchemaJson(vt, cn)},"optional":$optional$f}"""
      case st: StructType =>
        val fields = st.fields.map(x => connectSchemaJson(x.dataType, x.nullable, Some(x.name))).mkString(",")
        s"""{"type":"struct","fields":[$fields],"optional":$optional$f}"""
      case other => throw new UnsupportedOperationException(s"connect schema: $other")
    }
  }

  /** Encode columns as a JSON-with-embedded-schema envelope string column. */
  def toJsonEnvelope(payload: Column, payloadSchema: StructType): Column =
    concat(
      lit(s"""{"schema":${connectSchemaJson(payloadSchema)},"payload":"""),
      to_json(payload), lit("}"))

  /** Decode an envelope string column; returns the payload struct (the
    * schema half is declared, not inferred — Spark needs a static schema).
    * Corrupt/non-JSON records yield null (P13 tolerance).
    */
  def fromJsonEnvelope(envelope: Column, payloadSchema: StructType): Column = {
    val env = StructType(Seq(StructField("payload", payloadSchema)))
    from_json(envelope, env).getField("payload")
  }

  /** Plain JSON codec (schemas.enable=false). */
  def toJsonPlain(payload: Column): Column = to_json(payload)
  def fromJsonPlain(json: Column, schema: StructType): Column = from_json(json, schema)

  /** Delimited codec: encode = join with `delim`; decode = split + cast
    * per-field (the reference's delimited serde is string-only; we cast to
    * the declared schema like KSQL's DELIMITED format).
    */
  def toDelimited(delim: String, cols: Column*): Column = concat_ws(delim, cols: _*)

  def fromDelimited(df: DataFrame, inputCol: String, delim: String, schema: StructType): DataFrame = {
    val parts = split(col(inputCol), java.util.regex.Pattern.quote(delim))
    df.select(schema.fields.zipWithIndex.map { case (f, i) =>
      element_at(parts, i + 1).cast(f.dataType).as(f.name)
    }: _*)
  }
}
