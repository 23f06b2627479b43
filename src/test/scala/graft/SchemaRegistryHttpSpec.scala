package graft

import org.apache.spark.sql.types._
import graft.serde.{AvroCodec, HttpSchemaRegistry, InMemorySchemaRegistry, SchemaRegistryServer}

/** The registry seam over a REAL HTTP transport: an embedded
  * `com.sun.net.httpserver` registry (ephemeral loopback port) serving the
  * Confluent REST protocol, driven through [[HttpSchemaRegistry]] — the
  * full producer/consumer flow the reference's harness runs against its
  * embedded registry (`IntegrationTestHarness.java:335-349`), transport
  * included.
  */
class SchemaRegistryHttpSpec extends SparkSpec {
  import spark.implicits._

  private def withRegistry(f: HttpSchemaRegistry => Unit): Unit = {
    val server = new SchemaRegistryServer(new InMemorySchemaRegistry)
    try f(new HttpSchemaRegistry(server.url)) finally server.stop()
  }

  test("register is idempotent over HTTP; ids and versions match in-memory semantics") {
    withRegistry { reg =>
      val s1 = AvroCodec.avroSchema(StructType(Seq(
        StructField("w", StringType), StructField("n", LongType))))
      val s2 = AvroCodec.avroSchema(StructType(Seq(
        StructField("w", StringType), StructField("n", LongType),
        StructField("score", DoubleType))))
      assert(reg.register("words-value", s1) === 1)
      assert(reg.register("words-value", s1) === 1, "re-register must reuse the id")
      assert(reg.register("words-value", s2) === 2, "evolution allocates a fresh id")
      assert(reg.register("other-value", s1) === 1,
        "same canonical schema under another subject reuses the global id")
      assert(reg.versions("words-value").map(_._1) === Seq(1, 2))
      assert(reg.latest("words-value").map(_._1) === Some(2))
      assert(reg.getById(2).map(_.toString) === Some(s2.toString))
      assert(reg.getById(99).isEmpty, "unknown id is None (HTTP 404), not an error")
      assert(reg.versions("never-registered").isEmpty)
    }
  }

  test("framed encode/decode end-to-end through the HTTP transport") {
    withRegistry { reg =>
      val v1 = Seq(("be", 2L), ("to", 4L)).toDF("w", "n")
      val framed1 = AvroCodec.encodeFramed(v1, Seq("w", "n"), reg, "words-value")
      val v2 = Seq(("of", 6L, Some(0.5))).toDF("w", "n", "score")
      val framed2 = AvroCodec.encodeFramed(v2, Seq("w", "n", "score"), reg, "words-value")
      val st = StructType(Seq(StructField("w", StringType), StructField("n", LongType),
        StructField("score", DoubleType)))
      val back = AvroCodec.decodeFramed(framed1.union(framed2), "value", st,
          reg, "words-value")
        .as[(String, Long, Option[Double])].collect().toSet
      assert(back === Set(("be", 2L, None), ("to", 4L, None), ("of", 6L, Some(0.5))))
    }
  }

  test("HTTP failure modes are loud: bad route 404s, garbage schema 500s") {
    val server = new SchemaRegistryServer(new InMemorySchemaRegistry)
    try {
      val http = java.net.http.HttpClient.newHttpClient()
      def getCode(path: String): Int = http.send(
        java.net.http.HttpRequest.newBuilder(
          java.net.URI.create(server.url + path)).GET().build(),
        java.net.http.HttpResponse.BodyHandlers.ofString()).statusCode()
      assert(getCode("/no/such/route") === 404)
      assert(getCode("/subjects/ghost/versions") === 404)
      val bad = http.send(
        java.net.http.HttpRequest.newBuilder(
            java.net.URI.create(server.url + "/subjects/s/versions"))
          .POST(java.net.http.HttpRequest.BodyPublishers.ofString("{notjson"))
          .build(),
        java.net.http.HttpResponse.BodyHandlers.ofString())
      assert(bad.statusCode() === 500)
      assert(bad.body().contains("error_code"))
    } finally server.stop()
  }
}
