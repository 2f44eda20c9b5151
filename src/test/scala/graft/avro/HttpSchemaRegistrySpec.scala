package graft.avro

import com.fasterxml.jackson.databind.ObjectMapper
import com.sun.net.httpserver.{HttpExchange, HttpServer}
import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Drives [[HttpSchemaRegistry]] against an in-process stub speaking the
  * Confluent REST wire protocol, backed by the in-memory registry — so
  * the HTTP client is proven semantics-equivalent to [[SchemaRegistry]]
  * (the reference's fetch/register behavior,
  * `/root/reference/src/SchemaRegistry.cpp:57-160`) without a network.
  */
class HttpSchemaRegistrySpec extends AnyFunSuite with BeforeAndAfterAll {

  private val backing = new SchemaRegistry
  private val mapper = new ObjectMapper
  private var server: HttpServer = _
  private var url: String = _
  @volatile private var failNext = false

  private val SubjectVersions = "/subjects/([^/]+)/versions".r
  private val SubjectLatest = "/subjects/([^/]+)/versions/latest".r
  private val SchemaById = "/schemas/ids/([0-9]+)".r

  private def reply(x: HttpExchange, status: Int, body: String): Unit = {
    val bytes = body.getBytes(StandardCharsets.UTF_8)
    x.sendResponseHeaders(status, bytes.length)
    x.getResponseBody.write(bytes)
    x.close()
  }

  override def beforeAll(): Unit = {
    server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/", (x: HttpExchange) => {
      val path = x.getRequestURI.getPath
      if (failNext) { failNext = false; reply(x, 500, """{"error_code":50001,"message":"boom"}""") }
      else (x.getRequestMethod, path) match {
        case ("GET", SubjectLatest(subject)) =>
          // subject convention: {topic}-value
          backing.fetchValueSchema(subject.stripSuffix("-value")) match {
            case Some((id, schema)) =>
              val node = mapper.createObjectNode()
              node.put("subject", subject); node.put("version", 1)
              node.put("id", id); node.put("schema", schema)
              reply(x, 200, mapper.writeValueAsString(node))
            case None =>
              reply(x, 404, """{"error_code":40401,"message":"Subject not found"}""")
          }
        case ("POST", SubjectVersions(subject)) =>
          val body = new String(x.getRequestBody.readAllBytes(), StandardCharsets.UTF_8)
          val schema = mapper.readTree(body).get("schema").asText()
          val id = backing.register(subject, schema)
          reply(x, 200, s"""{"id":$id}""")
        case ("GET", SchemaById(id)) =>
          backing.fetchById(id.toInt) match {
            case Some(schema) =>
              val node = mapper.createObjectNode()
              node.put("schema", schema)
              reply(x, 200, mapper.writeValueAsString(node))
            case None =>
              reply(x, 404, """{"error_code":40403,"message":"Schema not found"}""")
          }
        case _ => reply(x, 404, """{"error_code":404,"message":"no route"}""")
      }
    })
    server.start()
    url = s"http://127.0.0.1:${server.getAddress.getPort}"
  }

  override def afterAll(): Unit = if (server != null) server.stop(0)

  private val schemaV1 =
    """{"type":"record","name":"spo","fields":[{"name":"subject","type":"string"}]}"""
  private val schemaV2 =
    """{"type":"record","name":"spo","fields":[{"name":"subject","type":"string"},{"name":"predicate","type":["null","string"],"default":null}]}"""

  test("register + fetch-by-subject + fetch-by-id round-trip over HTTP") {
    val client = new HttpSchemaRegistry(url)
    val id = client.register("spo-value", schemaV1)
    assert(id > 0)
    // idempotent re-register (same subject+schema -> same id)
    assert(client.register("spo-value", schemaV1) == id)
    assert(client.fetchValueSchema("spo") == Some((id, schemaV1)))
    assert(client.fetchById(id) == Some(schemaV1))
    // a NEW schema under the subject becomes the latest version
    val id2 = client.register("spo-value", schemaV2)
    assert(id2 != id)
    assert(client.fetchValueSchema("spo") == Some((id2, schemaV2)))
    // snapshot carries everything this driver fetched/registered
    assert(client.snapshot == Map(id -> schemaV1, id2 -> schemaV2))
  }

  test("unknown subject and id map to None, like the reference's -1/nullptr") {
    val client = new HttpSchemaRegistry(url)
    assert(client.fetchValueSchema("nope") == None)
    assert(client.fetchById(999999) == None)
  }

  test("non-404 server errors surface as RegistryHttpException") {
    val client = new HttpSchemaRegistry(url)
    failNext = true
    val e = intercept[RegistryHttpException](client.fetchValueSchema("spo"))
    assert(e.status == 500)
  }

  test("HTTP client and in-memory registry agree through the shared interface") {
    val http: RegistryClient = new HttpSchemaRegistry(url)
    val mem: RegistryClient = new SchemaRegistry
    val subject = "agree-value"
    val ids = (http.register(subject, schemaV1), mem.register(subject, schemaV1))
    // ids needn't be equal across registries; the (schema, latest)
    // semantics must be
    assert(http.fetchValueSchema("agree").map(_._2) == mem.fetchValueSchema("agree").map(_._2))
    assert(http.fetchById(ids._1) == mem.fetchById(ids._2))
  }
}
