package graft.avro

import com.fasterxml.jackson.databind.ObjectMapper
import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.charset.StandardCharsets
import java.time.Duration
import scala.collection.concurrent.TrieMap

/** Common surface of the reference's registry
  * (`/root/reference/src/SchemaRegistry.cpp:57-160`): register a value
  * schema under a `{topic}-value` subject, fetch the latest by subject,
  * fetch by id. Implemented twice — in-memory ([[SchemaRegistry]]) for
  * deterministic tests/oracles, over HTTP ([[HttpSchemaRegistry]]) for a
  * real Confluent-compatible endpoint — behind one interface, so every
  * decode path is source-agnostic.
  */
trait RegistryClient {
  /** Register `schemaJson` under `subject`, returning its id (idempotent
    * per (subject, schema), like `Serdes::Schema::add`). */
  def register(subject: String, schemaJson: String): Int

  /** Latest schema version for `{topic}-value` (`fetch_value_schema`). */
  def fetchValueSchema(topic: String): Option[(Int, String)]

  def fetchById(id: Int): Option[String]

  /** Immutable id → schema map for executor closures: the Spark shape of
    * registry access is fetch-on-driver then broadcast — never a
    * per-record (or per-executor) network call. */
  def snapshot: Map[Int, String]
}

/** Thrown for non-success registry responses other than 404 (which maps
  * to None, matching the reference's "No schema with name ... found"
  * branch that returns -1/nullptr rather than failing). */
final class RegistryHttpException(val status: Int, val body: String, url: String)
  extends RuntimeException(s"registry returned HTTP $status for $url: ${body.take(200)}")

/** Confluent Schema Registry REST client (driver-side only).
  *
  * Speaks the standard wire protocol the reference reaches through
  * libserdes (`schema.registry.url` in
  * `/root/reference/configs/SPO_2_kafka.yaml`):
  *
  *  - `POST /subjects/{subject}/versions`  {"schema": "<json>"} → {"id": n}
  *  - `GET  /subjects/{subject}/versions/latest` → {"id": n, "schema": "<json>"}
  *  - `GET  /schemas/ids/{id}` → {"schema": "<json>"}
  *
  * Not serializable by design: executors never talk to the registry.
  * Fetches are cached and exposed via [[snapshot]], which IS a plain
  * broadcastable map — the same driver-snapshot pattern the in-memory
  * registry uses, so swapping implementations doesn't change job shape.
  */
final class HttpSchemaRegistry(baseUrl: String, timeout: Duration = Duration.ofSeconds(10))
  extends RegistryClient {

  private val base = baseUrl.stripSuffix("/")
  private val cache = TrieMap.empty[Int, String]
  private val mapper = new ObjectMapper
  private val http = HttpClient.newBuilder().connectTimeout(timeout).build()

  private def get(path: String): Either[Int, String] = {
    val req = HttpRequest.newBuilder(URI.create(base + path))
      .timeout(timeout).GET().build()
    val resp = http.send(req, HttpResponse.BodyHandlers.ofString())
    if (resp.statusCode() / 100 == 2) Right(resp.body())
    else Left(resp.statusCode())
  }

  override def register(subject: String, schemaJson: String): Int = {
    val path = s"/subjects/${urlEncode(subject)}/versions"
    val payload = mapper.createObjectNode()
    payload.put("schema", schemaJson)
    val req = HttpRequest.newBuilder(URI.create(base + path))
      .timeout(timeout)
      .header("Content-Type", "application/vnd.schemaregistry.v1+json")
      .POST(HttpRequest.BodyPublishers.ofString(mapper.writeValueAsString(payload), StandardCharsets.UTF_8))
      .build()
    val resp = http.send(req, HttpResponse.BodyHandlers.ofString())
    if (resp.statusCode() / 100 != 2)
      throw new RegistryHttpException(resp.statusCode(), resp.body(), base + path)
    val id = mapper.readTree(resp.body()).get("id").asInt()
    cache.put(id, schemaJson)
    id
  }

  override def fetchValueSchema(topic: String): Option[(Int, String)] =
    get(s"/subjects/${urlEncode(s"$topic-value")}/versions/latest") match {
      case Left(404) => None
      case Left(status) => throw new RegistryHttpException(status, "", s"$base/subjects/$topic-value/versions/latest")
      case Right(body) =>
        val node = mapper.readTree(body)
        val id = node.get("id").asInt()
        val schema = node.get("schema").asText()
        cache.put(id, schema)
        Some((id, schema))
    }

  override def fetchById(id: Int): Option[String] = cache.get(id).orElse {
    get(s"/schemas/ids/$id") match {
      case Left(404) => None
      case Left(status) => throw new RegistryHttpException(status, "", s"$base/schemas/ids/$id")
      case Right(body) =>
        val schema = mapper.readTree(body).get("schema").asText()
        cache.put(id, schema)
        Some(schema)
    }
  }

  override def snapshot: Map[Int, String] = cache.toMap

  private def urlEncode(s: String): String =
    java.net.URLEncoder.encode(s, "UTF-8").replace("+", "%20")
}
