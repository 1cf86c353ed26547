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

/** Durable file-backed registry for CLI workflows (no registry service in
  * zero-egress environments; the reference requires a live Confluent
  * endpoint). Layout:
  * {{{
  *   <root>/schemas/<id>.avsc                 — schema text by id
  *   <root>/subjects/<subject>/<version>.txt  — the id registered at that version
  * }}}
  * Ids allocate with create-exclusive hard links, so concurrent producers
  * registering new schemas serialize instead of colliding — the same CAS
  * as pool manifests. Content-dedup per subject like a real registry.
  */
final class FileSchemaRegistry(root: String) extends SchemaRegistry {
  import java.nio.file.{Files, Path, Paths}
  import scala.jdk.CollectionConverters._

  private def schemasDir = Paths.get(root, "schemas")
  private def subjectDir(s: String) = Paths.get(root, "subjects",
    java.net.URLEncoder.encode(s, "UTF-8"))

  override def getSchema(id: Int): String = {
    val f = schemasDir.resolve(s"$id.avsc")
    require(Files.exists(f), s"no schema with id $id in $root")
    new String(Files.readAllBytes(f), "UTF-8")
  }

  def subjects(): Seq[String] = {
    val d = Paths.get(root, "subjects")
    if (!Files.isDirectory(d)) Nil
    else Files.list(d).iterator.asScala.toSeq
      .map(p => java.net.URLDecoder.decode(p.getFileName.toString, "UTF-8"))
      .sorted
  }

  /** (version, id) pairs for a subject, ascending version. */
  def versions(subject: String): Seq[(Int, Int)] = {
    val d = subjectDir(subject)
    if (!Files.isDirectory(d)) Nil
    else Files.list(d).iterator.asScala.toSeq
      .filter(_.getFileName.toString.endsWith(".txt"))
      .map { p =>
        val v = p.getFileName.toString.stripSuffix(".txt").toInt
        v -> new String(Files.readAllBytes(p), "UTF-8").trim.toInt
      }.sortBy(_._1)
  }

  override def createSchema(subject: String, schema: String): Int = {
    Files.createDirectories(schemasDir)
    Files.createDirectories(subjectDir(subject))
    // content dedup within the subject
    versions(subject).find { case (_, id) => getSchema(id) == schema } match {
      case Some((_, id)) => id
      case None =>
        val id = allocateId(schema)
        val ver = versions(subject).lastOption.map(_._1 + 1).getOrElse(1)
        publish(subjectDir(subject).resolve(s"$ver.txt"), id.toString.getBytes,
          retryName = v => subjectDir(subject).resolve(s"${v + ver}.txt"))
        // Two writers can race the dedup scan above and each allocate an id
        // for the same schema text. Re-scan after publishing and converge on
        // the earliest registered id (the race winner); the loser's version
        // entry remains as a harmless duplicate, as in a real registry
        // where version N and N+1 may carry identical schemas.
        versions(subject).find { case (_, i) => getSchema(i) == schema }
          .map(_._2).getOrElse(id)
    }
  }

  private def allocateId(schema: String): Int = {
    val existing = Files.list(schemasDir).iterator.asScala.toSeq
      .map(_.getFileName.toString.stripSuffix(".avsc").toInt)
    var id = (existing :+ 0).max + 1
    val tmp = schemasDir.resolve(s".tmp-${java.util.UUID.randomUUID().toString.take(8)}")
    Files.write(tmp, schema.getBytes("UTF-8"))
    try {
      var attempt = 0
      while (attempt < 1000) {
        try {
          Files.createLink(schemasDir.resolve(s"$id.avsc"), tmp)
          return id
        } catch {
          case _: java.nio.file.FileAlreadyExistsException => id += 1; attempt += 1
        }
      }
      throw new IllegalStateException("FileSchemaRegistry: id allocation races")
    } finally Files.deleteIfExists(tmp)
  }

  private def publish(target: Path, bytes: Array[Byte], retryName: Int => Path): Unit = {
    val tmp = target.getParent.resolve(s".tmp-${java.util.UUID.randomUUID().toString.take(8)}")
    Files.write(tmp, bytes)
    try {
      var i = 0
      while (i < 1000) {
        try {
          Files.createLink(if (i == 0) target else retryName(i), tmp)
          return
        } catch {
          case _: java.nio.file.FileAlreadyExistsException => i += 1
        }
      }
      throw new IllegalStateException("FileSchemaRegistry: version races")
    } finally Files.deleteIfExists(tmp)
  }
}

/** Minimal HTTP client for the Confluent registry REST API
  * (POST /subjects/{subject}/versions, GET /schemas/ids/{id}) using only
  * JDK classes. Responses are memoized per JVM.
  */
final class HttpSchemaRegistry(baseUrl: String,
    credentials: Option[(String, String)] = None) extends SchemaRegistry {
  @transient private lazy val client = java.net.http.HttpClient.newHttpClient()

  /** Basic-auth header for Confluent Cloud API keys
    * (ref cli/flags.go:36-41 passes user/password from schema_registry.json).
    */
  private[graft] def authHeader: Option[String] = credentials.map { case (u, p) =>
    "Basic " + java.util.Base64.getEncoder.encodeToString(
      s"$u:$p".getBytes(java.nio.charset.StandardCharsets.UTF_8))
  }

  private def withAuth(b: java.net.http.HttpRequest.Builder) =
    authHeader.fold(b)(h => b.header("Authorization", h))
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

  /** Send, check the HTTP status, and pull `field` out of the JSON body.
    * A non-2xx (401/403 bad credentials, 404 unknown id/subject, 5xx)
    * throws a descriptive error BEFORE parsing; a thrown closure is never
    * inserted by `getOrElseUpdate`, so failures are not memoized.
    */
  private def sendForField(req: java.net.http.HttpRequest, field: String,
      what: String): com.fasterxml.jackson.databind.JsonNode = {
    val resp = client.send(req, java.net.http.HttpResponse.BodyHandlers.ofString())
    val code = resp.statusCode()
    if (code < 200 || code >= 300)
      throw new java.io.IOException(
        s"schema registry $what failed: HTTP $code from ${req.uri()}" +
          (if (code == 401 || code == 403) " (authentication/authorization)" else "") +
          s": ${resp.body().take(300)}")
    val om = new com.fasterxml.jackson.databind.ObjectMapper()
    val node = om.readTree(resp.body()).get(field)
    if (node == null)
      throw new java.io.IOException(
        s"schema registry $what: HTTP $code but no '$field' in response: ${resp.body().take(300)}")
    node
  }

  override def getSchema(id: Int): String =
    idCache.getOrElseUpdate(id, {
      val req = withAuth(java.net.http.HttpRequest.newBuilder()
        .uri(java.net.URI.create(s"$baseUrl/schemas/ids/$id")).GET()).build()
      sendForField(req, "schema", s"getSchema(id=$id)").asText()
    })

  override def createSchema(subject: String, schema: String): Int =
    createCache.getOrElseUpdate((subject, schema), {
      val payload = s"""{"schema": "${jsonEscape(schema)}"}"""
      val req = withAuth(java.net.http.HttpRequest.newBuilder()
        .uri(java.net.URI.create(s"$baseUrl/subjects/$subject/versions"))
        .header("Content-Type", "application/vnd.schemaregistry.v1+json")
        .POST(java.net.http.HttpRequest.BodyPublishers.ofString(payload))).build()
      sendForField(req, "id", s"createSchema(subject=$subject)").asInt()
    })
}
