package graft.codecs

import scala.collection.concurrent.TrieMap

/** Confluent-style schema registry client surface
  * (ref: zavro/decoder.go:54-72 GetSchema, zavro/encoder.go:37-57
  * CreateSchema — both memoized).
  */
trait SchemaRegistry extends Serializable {
  def getSchema(id: Int): String
  /** Register (or fetch the existing id of) `schema` under `subject`. */
  def createSchema(subject: String, schema: String): Int
}

/** In-process registry for tests and local runs. Content-addressed ids so
  * re-registration of an identical schema dedups like a real registry.
  */
final class InMemorySchemaRegistry extends SchemaRegistry {
  private val byId = TrieMap.empty[Int, String]
  private val bySubjectSchema = TrieMap.empty[(String, String), Int]
  private val nextId = new java.util.concurrent.atomic.AtomicInteger(1)

  override def getSchema(id: Int): String =
    byId.getOrElse(id, throw new NoSuchElementException(s"no schema with id $id"))

  override def createSchema(subject: String, schema: String): Int =
    bySubjectSchema.getOrElseUpdate((subject, schema), {
      val id = nextId.getAndIncrement()
      byId(id) = schema
      id
    })
}

/** Minimal HTTP client for the Confluent registry REST API
  * (POST /subjects/{subject}/versions, GET /schemas/ids/{id}) using only
  * JDK classes. Responses are memoized per JVM.
  */
final class HttpSchemaRegistry(baseUrl: String) extends SchemaRegistry {
  @transient private lazy val client = java.net.http.HttpClient.newHttpClient()
  private val idCache = TrieMap.empty[Int, String]
  private val createCache = TrieMap.empty[(String, String), Int]

  private def jsonEscape(s: String): String =
    s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    }

  override def getSchema(id: Int): String =
    idCache.getOrElseUpdate(id, {
      val req = java.net.http.HttpRequest.newBuilder()
        .uri(java.net.URI.create(s"$baseUrl/schemas/ids/$id")).GET().build()
      val body = client.send(req,
        java.net.http.HttpResponse.BodyHandlers.ofString()).body()
      val om = new com.fasterxml.jackson.databind.ObjectMapper()
      om.readTree(body).get("schema").asText()
    })

  override def createSchema(subject: String, schema: String): Int =
    createCache.getOrElseUpdate((subject, schema), {
      val payload = s"""{"schema": "${jsonEscape(schema)}"}"""
      val req = java.net.http.HttpRequest.newBuilder()
        .uri(java.net.URI.create(s"$baseUrl/subjects/$subject/versions"))
        .header("Content-Type", "application/vnd.schemaregistry.v1+json")
        .POST(java.net.http.HttpRequest.BodyPublishers.ofString(payload)).build()
      val body = client.send(req,
        java.net.http.HttpResponse.BodyHandlers.ofString()).body()
      val om = new com.fasterxml.jackson.databind.ObjectMapper()
      om.readTree(body).get("id").asInt()
    })
}
