package graft.avro

import java.util.concurrent.ConcurrentHashMap
import scala.jdk.CollectionConverters._

/** In-memory Confluent-style schema registry.
  *
  * Mirrors the reference's `SchemaRegistry` singleton
  * (`src/SchemaRegistry.cpp:57-160`): subjects follow the
  * `{topic}-value` convention, registering a schema assigns a positive
  * id, and consumers fetch `(id, schema)` to decode CP1-framed messages.
  * No HTTP — the registry is a process-local map whose contents are
  * shipped to executors as plain serializable state (a schema id → JSON
  * map), which is exactly how a 1000-executor job wants registry data:
  * fetched once on the driver, broadcast with the closure, never a
  * per-record network call.
  */
final class SchemaRegistry extends RegistryClient with Serializable {
  // (subject, schema) -> id: re-registering the same schema under a
  // subject is idempotent; a NEW schema under the same subject gets a
  // new id — i.e. subjects are versioned, like a real Confluent registry
  private val byKey = new ConcurrentHashMap[String, Int]()
  private val byId = new ConcurrentHashMap[Int, String]()
  private val latestBySubject = new ConcurrentHashMap[String, Int]()
  private val nextId = new java.util.concurrent.atomic.AtomicInteger(1)

  /** Register `schemaJson` under `subject`, returning its id (idempotent
    * per (subject, schema), like `Serdes::Schema::add`). */
  def register(subject: String, schemaJson: String): Int = {
    val id = byKey.computeIfAbsent(subject + "\u0000" + schemaJson, _ => {
      val i = nextId.getAndIncrement()
      byId.put(i, schemaJson)
      i
    })
    // ids are assigned in registration order, so max id == latest version
    latestBySubject.merge(subject, id, (a, b) => math.max(a, b))
    id
  }

  /** `fetch_value_schema`: LATEST schema version for `{topic}-value`. */
  def fetchValueSchema(topic: String): Option[(Int, String)] = {
    val subject = s"$topic-value"
    Option(latestBySubject.get(subject)).map(id => (id, byId.get(id)))
  }

  def fetchById(id: Int): Option[String] = Option(byId.get(id))

  /** Immutable snapshot for executor closures. */
  def snapshot: Map[Int, String] = byId.asScala.toMap
}

object SchemaRegistry {
  /** Convenience one-topic registry (the reference registers `spo`). */
  def withSchema(topic: String, schemaJson: String): (SchemaRegistry, Int) = {
    val r = new SchemaRegistry
    val id = r.register(s"$topic-value", schemaJson)
    (r, id)
  }
}
