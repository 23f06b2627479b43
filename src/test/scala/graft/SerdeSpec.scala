package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.ops.Multimodal
import graft.serde.{AvroCodec, Serdes}

/** Serde matrix round-trips (M0, FIXTURES.md F4) + multimodal plumbing. */
class SerdeSpec extends SparkSpec {
  import spark.implicits._

  private val wordSchema = StructType(Seq(
    StructField("word", StringType), StructField("count", LongType)))

  test("JSON envelope round-trip (schemas.enable=true, ref JsonSerde.java:8-39)") {
    val df = Seq(("to", 4L), ("be", 2L)).toDF("word", "count")
    val enveloped = df.select(
      Serdes.toJsonEnvelope(struct($"word", $"count"), wordSchema).as("env"))
    val sample = enveloped.as[String].head()
    assert(sample.startsWith("""{"schema":{"type":"struct","fields":["""))
    assert(sample.contains(""""payload":{"word":"to","count":4}"""))
    val back = enveloped.select(Serdes.fromJsonEnvelope($"env", wordSchema).as("r"))
      .select("r.*").as[(String, Long)].collect().toSet
    assert(back === Set(("to", 4L), ("be", 2L)))
  }

  test("plain JSON round-trip (schemas.enable=false) and bad-record null") {
    val df = Seq(("to", 4L)).toDF("word", "count")
    val j = df.select(Serdes.toJsonPlain(struct($"word", $"count")).as("j"))
    val back = j.select(Serdes.fromJsonPlain($"j", wordSchema).as("r")).select("r.*")
    assert(back.as[(String, Long)].head() === (("to", 4L)))
    // PERMISSIVE mode parses corrupt input to an all-null-fields struct
    val bad = Seq("not json at all").toDF("j")
      .select(Serdes.fromJsonPlain($"j", wordSchema).as("r"))
    assert(bad.filter($"r.word".isNotNull || $"r.count".isNotNull).count() === 0)
  }

  test("delimited round-trip with typed decode (ref IntegrationTestHarness delimited serde)") {
    val df = Seq((1L, "ORDER_1", 10.5), (2L, "ORDER_2", 20.0)).toDF("id", "name", "units")
    val line = df.select(Serdes.toDelimited(",", $"id", $"name", $"units").as("line"))
    assert(line.as[String].collect().toSet === Set("1,ORDER_1,10.5", "2,ORDER_2,20.0"))
    val schema = StructType(Seq(StructField("id", LongType),
      StructField("name", StringType), StructField("units", DoubleType)))
    val back = Serdes.fromDelimited(line, "line", ",", schema)
    assert(back.as[(Long, String, Double)].collect().toSet ===
      Set((1L, "ORDER_1", 10.5), (2L, "ORDER_2", 20.0)))
  }

  test("Avro binary round-trip incl. nulls and narrow ints (ref Avro converter path)") {
    val schema = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("name", StringType, nullable = true),
      StructField("score", DoubleType, nullable = true),
      StructField("small", ShortType, nullable = true),
      StructField("tiny", ByteType, nullable = false)))
    val df = spark.createDataFrame(
      java.util.List.of(
        org.apache.spark.sql.Row(1L, "alpha", 0.5, 7.toShort, 3.toByte),
        org.apache.spark.sql.Row(2L, null, null, null, 9.toByte)),
      schema)
    val encoded = AvroCodec.encode(df, Seq("id", "name", "score", "small", "tiny"))
    assert(encoded.schema.fields.map(f => (f.name, f.dataType)).toSeq ===
      Seq(("value", BinaryType)))
    val back = AvroCodec.decode(encoded, "value", schema)
    assert(back.collect().toSet === df.collect().toSet)
  }

  test("format conversion: Avro in, JSON out (P11, ref :267-287)") {
    // decode uses the WRITER schema (Avro binary is not self-describing):
    // toDF gives word nullable, count non-nullable
    val schema = StructType(Seq(
      StructField("word", StringType, nullable = true),
      StructField("count", LongType, nullable = false)))
    val df = Seq(("to", 4L)).toDF("word", "count")
    val avro = AvroCodec.encode(df, Seq("word", "count"))
    val json = AvroCodec.decode(avro, "value", schema)
      .select(Serdes.toJsonPlain(struct($"word", $"count")).as("j"))
    assert(json.as[String].head() === """{"word":"to","count":4}""")
  }

  test("multimodal: media struct + stub feature extraction is deterministic and batched") {
    val df = Seq((1L, "imagebytes-aaaa"), (2L, "imagebytes-bbbb")).toDF("id", "raw")
      .select($"id", Multimodal.asMedia(encode($"raw", "UTF-8"), "image/png").as("media"))
    assert(df.schema("media").dataType.asInstanceOf[StructType].fieldNames.toSeq ===
      Multimodal.mediaSchema.fieldNames.toSeq)
    val f1 = Multimodal.extractFeatures(df, "id", "media", dims = 8).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    val f2 = Multimodal.extractFeatures(df, "id", "media", dims = 8).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    assert(f1 === f2)                       // deterministic
    assert(f1(1L).length === 8)
    assert(f1(1L) !== f1(2L))               // payload-sensitive
  }

  test("multimodal: null payload yields null features / zero frames, not an NPE") {
    val df = Seq((1L, Some("ok")), (2L, None)).toDF("id", "raw")
      .select($"id", Multimodal.asMedia(encode($"raw", "UTF-8"), "image/png").as("media"))
    val feats = Multimodal.extractFeatures(df, "id", "media", dims = 4).collect()
      .map(r => r.getLong(0) -> r.isNullAt(1)).toMap
    assert(feats(1L) === false && feats(2L) === true)
    val frames = Multimodal.sampleFrames(df, "id", "media", frames = 2).collect()
    assert(frames.forall(_.getLong(0) == 1L))
  }

  test("multimodal: frame sampling fans out 1->N with full payload coverage") {
    val payload = "0123456789abcdef"
    val df = Seq((7L, payload)).toDF("id", "raw")
      .select($"id", Multimodal.asMedia(encode($"raw", "UTF-8"), "video/mp4").as("media"))
    val frames = Multimodal.sampleFrames(df, "id", "media", frames = 4).collect()
    assert(frames.length === 4)
    val joined = frames.sortBy(_.getInt(1)).flatMap(_.getAs[Array[Byte]](2)).toSeq
    assert(new String(joined.toArray, "UTF-8") === payload)
  }

  test("multimodal: resize updates metadata, payload untouched") {
    val df = Seq((1L, "xx")).toDF("id", "raw")
      .select($"id", Multimodal.asMedia(encode($"raw", "UTF-8"), "image/png").as("media"))
    val out = Multimodal.resize(df, "media", 224, 224).select("media.*").collect().head
    assert(out.getAs[Int]("width") === 224 && out.getAs[Int]("height") === 224)
    assert(new String(out.getAs[Array[Byte]]("payload"), "UTF-8") === "xx")
  }

  test("registry wire format: frame adds 0x00+id header, unframe recovers body+id") {
    val src = Seq(("be", 2L), ("to", 4L)).toDF("w", "n")
    val st = src.schema
    val framed = AvroCodec.frame(AvroCodec.encode(src, Seq("w", "n")), "value", 42)
    val raw = framed.select("value").as[Array[Byte]].head()
    assert(raw(0) === 0.toByte && raw(4) === 42.toByte, "magic + big-endian id")
    val unframed = AvroCodec.unframe(framed, "value")
    assert(unframed.select("schema_id").as[Option[Int]].collect().forall(_.contains(42)))
    val back = AvroCodec.decode(unframed, "value", st)
      .as[(String, Long)].collect().toSet
    assert(back === Set(("be", 2L), ("to", 4L)))
    // heuristic mode (strict=false, mixed topics): raw records whose lead
    // byte isn't 0x00 pass through unchanged, schema_id null. Sound here
    // because the leading string field can't encode to 0x00.
    val passthrough = AvroCodec.unframe(AvroCodec.encode(src, Seq("w", "n")), "value",
      strict = false)
    assert(passthrough.select("schema_id").collect().forall(_.isNullAt(0)))
    assert(AvroCodec.decode(passthrough, "value", st).as[(String, Long)].collect().toSet
      === Set(("be", 2L), ("to", 4L)))
  }

  test("registry wire format: high-bit schema ids decode as signed int32, not null") {
    val src = Seq(("x", 1L)).toDF("w", "n")
    val id = Int.MinValue + 7 // 0x80000007 — overflows an unsigned cast("int")
    val framed = AvroCodec.frame(AvroCodec.encode(src, Seq("w", "n")), "value", id)
    assert(AvroCodec.unframe(framed, "value")
      .select("schema_id").as[Option[Int]].head() === Some(id))
  }

  test("registry seam: evolving schema ids round-trip; old ids fill reader defaults") {
    val registry = new graft.serde.InMemorySchemaRegistry
    // v1 producer: (w, n)
    val v1 = Seq(("be", 2L), ("to", 4L)).toDF("w", "n")
    val framed1 = AvroCodec.encodeFramed(v1, Seq("w", "n"), registry, "words-value")
    // re-encoding an UNCHANGED schema reuses the id (serializers re-register
    // per batch — a fresh id each time would explode the registry)
    val framed1b = AvroCodec.encodeFramed(v1, Seq("w", "n"), registry, "words-value")
    val ids = (AvroCodec.unframe(framed1, "value") union AvroCodec.unframe(framed1b, "value"))
      .select("schema_id").as[Int].collect().toSet
    assert(ids === Set(1), s"idempotent re-register must reuse id 1, saw $ids")
    // v2 producer EVOLVES the schema: adds a nullable score column
    val v2 = Seq(("of", 6L, Some(0.5)), ("in", 8L, None)).toDF("w", "n", "score")
    val framed2 = AvroCodec.encodeFramed(v2, Seq("w", "n", "score"), registry, "words-value")
    assert(AvroCodec.unframe(framed2, "value")
      .select("schema_id").as[Int].collect().toSet === Set(2), "evolution allocates id 2")
    // one topic, both versions: consumer declares the v2 reader schema and
    // decodes the mix — v1 records resolve score to the reader default null
    val topic = framed1.union(framed2)
    val st = StructType(Seq(StructField("w", StringType), StructField("n", LongType),
      StructField("score", DoubleType)))
    val back = AvroCodec.decodeFramed(topic, "value", st, registry, "words-value")
      .as[(String, Long, Option[Double])].collect().toSet
    assert(back === Set(("be", 2L, None), ("to", 4L, None),
      ("of", 6L, Some(0.5)), ("in", 8L, None)))
    // an id the subject never registered fails loudly, not as garbage rows
    val alien = AvroCodec.frame(AvroCodec.encode(v1, Seq("w", "n")), "value", 99)
    val err = intercept[org.apache.spark.SparkException] {
      AvroCodec.decodeFramed(alien, "value", st, registry, "words-value").collect()
    }
    assert(err.getMessage.contains("99") ||
      Option(err.getCause).exists(_.getMessage.contains("99")))
  }
}
