package graft.serde

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.charset.StandardCharsets.UTF_8
import java.time.Duration

import com.fasterxml.jackson.databind.ObjectMapper
import com.fasterxml.jackson.databind.node.JsonNodeFactory
import com.sun.net.httpserver.{HttpExchange, HttpServer}
import org.apache.avro.Schema

/** HTTP transport for the [[SchemaRegistryClient]] seam — the Confluent
  * Schema Registry REST protocol (the reference builds its serializers
  * against exactly this service, `IntegrationTestHarness.java:335-349`):
  *
  *   - `POST /subjects/{subject}/versions` body `{"schema": "<json>"}`
  *     → `{"id": N}` (idempotent per canonical schema)
  *   - `GET /schemas/ids/{id}` → `{"schema": "<json>"}` | 404
  *   - `GET /subjects/{subject}/versions` → `[1, 2, …]`
  *   - `GET /subjects/{subject}/versions/{v|latest}` →
  *     `{"subject": s, "version": v, "id": N, "schema": "<json>"}`
  *
  * Registry calls happen DRIVER-side only ([[AvroCodec.decodeFramed]]
  * snapshots a subject's versions into the closure), so the client needs a
  * working HTTP endpoint only where the query is planned — executors never
  * see it. Uses the JDK's `java.net.http.HttpClient`; JSON via the Jackson
  * that ships with Spark. Content type is Confluent's
  * `application/vnd.schemaregistry.v1+json`.
  */
class HttpSchemaRegistry(baseUrl: String,
    timeout: Duration = Duration.ofSeconds(10)) extends SchemaRegistryClient {
  private val base = baseUrl.stripSuffix("/")
  private val mapper = new ObjectMapper
  private val http = HttpClient.newBuilder().connectTimeout(timeout).build()

  private def send(req: HttpRequest): HttpResponse[String] =
    http.send(req, HttpResponse.BodyHandlers.ofString(UTF_8))

  private def get(path: String): Option[String] = {
    val r = send(HttpRequest.newBuilder(URI.create(base + path))
      .timeout(timeout).GET().build())
    r.statusCode() match {
      case 200 => Some(r.body())
      case 404 => None
      case c => throw new java.io.IOException(
        s"registry GET $path failed: HTTP $c ${r.body().take(200)}")
    }
  }

  override def register(subject: String, schema: Schema): Int = {
    val body = JsonNodeFactory.instance.objectNode()
    body.put("schema", schema.toString)
    val r = send(HttpRequest.newBuilder(
        URI.create(s"$base/subjects/${enc(subject)}/versions"))
      .timeout(timeout)
      .header("Content-Type", "application/vnd.schemaregistry.v1+json")
      .POST(HttpRequest.BodyPublishers.ofString(body.toString, UTF_8)).build())
    if (r.statusCode() != 200) throw new java.io.IOException(
      s"registry register under '$subject' failed: HTTP ${r.statusCode()} ${r.body().take(200)}")
    mapper.readTree(r.body()).get("id").asInt()
  }

  override def getById(id: Int): Option[Schema] =
    get(s"/schemas/ids/$id").map { body =>
      new Schema.Parser().parse(mapper.readTree(body).get("schema").asText())
    }

  override def versions(subject: String): Seq[(Int, Schema)] =
    get(s"/subjects/${enc(subject)}/versions") match {
      case None => Seq.empty
      case Some(list) =>
        val arr = mapper.readTree(list)
        (0 until arr.size()).map { i =>
          val v = arr.get(i).asInt()
          val body = get(s"/subjects/${enc(subject)}/versions/$v").getOrElse(
            throw new java.io.IOException(
              s"registry listed version $v of '$subject' then 404'd it"))
          val node = mapper.readTree(body)
          node.get("id").asInt() ->
            new Schema.Parser().parse(node.get("schema").asText())
        }
    }

  private def enc(s: String): String =
    java.net.URLEncoder.encode(s, UTF_8).replace("+", "%20")
}

/** Embeddable registry SERVER speaking the same protocol over the JDK's
  * `com.sun.net.httpserver` — serves any [[SchemaRegistryClient]] (an
  * [[InMemorySchemaRegistry]] in tests, mirroring the reference harness's
  * embedded registry). Bind port 0 for an ephemeral port; `url` is the
  * base a client should use.
  */
class SchemaRegistryServer(delegate: SchemaRegistryClient, port: Int = 0) {
  private val mapper = new ObjectMapper
  private val server = HttpServer.create(new java.net.InetSocketAddress(
    java.net.InetAddress.getLoopbackAddress, port), 0)
  server.createContext("/", (ex: HttpExchange) => handle(ex))
  server.start()

  def url: String =
    s"http://${server.getAddress.getHostString}:${server.getAddress.getPort}"

  def stop(): Unit = server.stop(0)

  private def respond(ex: HttpExchange, code: Int, body: String): Unit = {
    val bytes = body.getBytes(UTF_8)
    ex.getResponseHeaders.set("Content-Type",
      "application/vnd.schemaregistry.v1+json")
    ex.sendResponseHeaders(code, bytes.length.toLong)
    ex.getResponseBody.write(bytes)
    ex.close()
  }

  private def notFound(ex: HttpExchange, code: Int, msg: String): Unit =
    respond(ex, 404, s"""{"error_code":$code,"message":"$msg"}""")

  private def handle(ex: HttpExchange): Unit = try {
    val method = ex.getRequestMethod
    val parts = ex.getRequestURI.getPath.split("/").filter(_.nonEmpty)
      .map(p => java.net.URLDecoder.decode(p, UTF_8))
    (method, parts.toSeq) match {
      case ("POST", Seq("subjects", subject, "versions")) =>
        val body = new String(ex.getRequestBody.readAllBytes(), UTF_8)
        val schema = new Schema.Parser().parse(
          mapper.readTree(body).get("schema").asText())
        val id = delegate.register(subject, schema)
        respond(ex, 200, s"""{"id":$id}""")
      case ("GET", Seq("schemas", "ids", idStr)) =>
        delegate.getById(idStr.toInt) match {
          case Some(s) => respond(ex, 200, schemaJson(s))
          case None => notFound(ex, 40403, "Schema not found")
        }
      case ("GET", Seq("subjects", subject, "versions")) =>
        val vs = delegate.versions(subject)
        if (vs.isEmpty) notFound(ex, 40401, "Subject not found")
        else respond(ex, 200, vs.indices.map(_ + 1).mkString("[", ",", "]"))
      case ("GET", Seq("subjects", subject, "versions", vStr)) =>
        val vs = delegate.versions(subject)
        val idx = if (vStr == "latest") vs.size - 1 else vStr.toInt - 1
        if (idx < 0 || idx >= vs.size) notFound(ex, 40402, "Version not found")
        else {
          val (id, schema) = vs(idx)
          val node = JsonNodeFactory.instance.objectNode()
          node.put("subject", subject)
          node.put("version", idx + 1)
          node.put("id", id)
          node.put("schema", schema.toString)
          respond(ex, 200, node.toString)
        }
      case _ => notFound(ex, 40401, "No such route")
    }
  } catch {
    case e: Throwable =>
      respond(ex, 500, s"""{"error_code":50001,"message":"${
        String.valueOf(e.getMessage).replaceAll("[\"\\\\\\n\\r]", " ").take(150)}"}""")
  }

  private def schemaJson(s: Schema): String = {
    val node = JsonNodeFactory.instance.objectNode()
    node.put("schema", s.toString)
    node.toString
  }
}
