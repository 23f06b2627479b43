package graft.serde

import org.apache.avro.Schema

/** Schema-registry CLIENT seam (the reference's Confluent registry
  * interaction, `IntegrationTestHarness.java:335-349`, where serializers
  * are built against a `SchemaRegistryClient`): register a schema under a
  * subject and resolve writer schemas by wire id. [[AvroCodec.encodeFramed]]
  * / [[AvroCodec.decodeFramed]] speak the registry WIRE FORMAT through this
  * trait, so the only thing missing versus a live registry is the HTTP
  * transport — plug an HTTP-backed implementation in here and every framed
  * topic path works unchanged.
  *
  * Contract mirrors the Confluent semantics the reference relies on:
  *  - ids are positive and stable: registering the SAME schema (canonical
  *    form) under the same subject returns the existing id, never a new one
  *    (serializers re-register on every batch — idempotence is load-bearing);
  *  - a subject's versions are ordered; `latest` is what a fresh producer
  *    serializes with;
  *  - `getById` is global (wire ids are registry-wide, not per-subject).
  */
trait SchemaRegistryClient {

  /** Register (idempotently) and return the schema's id. */
  def register(subject: String, schema: Schema): Int

  /** Resolve a wire id to its schema — the consumer-side lookup. */
  def getById(id: Int): Option[Schema]

  /** A subject's registered versions, oldest first, as (id, schema). */
  def versions(subject: String): Seq[(Int, Schema)]

  /** The subject's newest version — what a fresh producer frames with. */
  def latest(subject: String): Option[(Int, Schema)] = versions(subject).lastOption
}

/** In-process [[SchemaRegistryClient]]: full registry semantics minus the
  * HTTP transport. Thread-safe; ids are allocated registry-wide starting
  * at 1 (the Confluent convention).
  */
class InMemorySchemaRegistry extends SchemaRegistryClient {
  private val lock = new Object
  private var nextId = 1
  private var byId = Map.empty[Int, Schema]
  // canonical-form JSON → id, REGISTRY-WIDE (Confluent ids identify the
  // schema, not the (subject, schema) pair — the same canonical schema
  // registered under a second subject reuses its global id); registration
  // is idempotent per subject via the version vector
  private var bySubject = Map.empty[String, Vector[Int]]
  private var byCanonical = Map.empty[String, Int]

  override def register(subject: String, schema: Schema): Int = lock.synchronized {
    val canonical = schema.toString // Schema.toString is the canonical JSON
    val id = byCanonical.getOrElse(canonical, {
      val fresh = nextId
      nextId += 1
      byId += fresh -> schema
      byCanonical += canonical -> fresh
      fresh
    })
    val versions = bySubject.getOrElse(subject, Vector.empty)
    if (!versions.contains(id))
      bySubject += subject -> (versions :+ id)
    id
  }

  override def getById(id: Int): Option[Schema] = lock.synchronized(byId.get(id))

  override def versions(subject: String): Seq[(Int, Schema)] = lock.synchronized {
    bySubject.getOrElse(subject, Vector.empty).map(id => id -> byId(id))
  }
}
