package graft

import com.fasterxml.jackson.databind.ObjectMapper
import graft.codecs.HttpSchemaRegistry
import graft.streaming.KafkaBus
import java.nio.file.{Files, Paths}

/** Connection-config files mirroring the reference's `~/.zync/` directory
  * (cli/flags.go:28-130): `kafka.json` carries broker + SASL/SSL settings,
  * `schema_registry.json` the Confluent registry endpoint and basic-auth
  * key. Kafka settings map onto Spark's Kafka source/sink options (the
  * `kafka.`-prefixed passthrough), so a secured cluster is reachable from
  * the CLI with the same files a zync user already has.
  */
object Config {

  /** Parsed `kafka.json`: broker list plus the Spark Kafka options that
    * encode the security settings.
    */
  final case class Kafka(bootstrapServers: String, options: Map[String, String]) {
    def bus: KafkaBus = new KafkaBus(bootstrapServers, options)
  }

  /** Parsed `schema_registry.json` (apiKey in the reference). */
  final case class Registry(url: String, user: Option[String],
      password: Option[String]) {
    def registry: HttpSchemaRegistry = new HttpSchemaRegistry(url, user.zip(password))
  }

  private def field(json: com.fasterxml.jackson.databind.JsonNode,
      key: String): Option[String] =
    Option(json.get(key)).map(_.asText).filter(_.nonEmpty)

  /** Parse `kafka.json` — same keys and the same validation as the
    * reference (cli/flags.go:66-130): unknown `security_protocol` or
    * `sasl_mechanisms` values are errors, SASL_* requires PLAIN.
    */
  def parseKafka(json: String): Kafka = {
    val n = new ObjectMapper().readTree(json)
    val servers = field(n, "bootstrap_servers").getOrElse(
      throw new IllegalArgumentException("kafka.json: bootstrap_servers required"))
    val proto = field(n, "security_protocol").getOrElse("PLAINTEXT")
    if (!Set("PLAINTEXT", "SASL_PLAINTEXT", "SSL", "SASL_SSL")(proto))
      throw new IllegalArgumentException(
        s"""unknown security_protocol value "$proto"""")
    var opts = Map("kafka.security.protocol" -> proto)
    if (proto.startsWith("SASL_")) {
      val mech = field(n, "sasl_mechanisms").getOrElse("")
      if (mech != "PLAIN")
        throw new IllegalArgumentException(
          s"""unknown sasl_mechanisms value "$mech"""")
      // JAAS values are double-quoted strings: backslashes and quotes in
      // credentials must be escaped or the config string breaks (or worse,
      // injects extra JAAS options)
      def jaasQuote(v: String): String =
        "\"" + v.replace("\\", "\\\\").replace("\"", "\\\"") + "\""
      val user = field(n, "sasl_username").getOrElse("")
      val pass = field(n, "sasl_password").getOrElse("")
      opts ++= Map(
        "kafka.sasl.mechanism" -> "PLAIN",
        "kafka.sasl.jaas.config" ->
          ("org.apache.kafka.common.security.plain.PlainLoginModule required " +
            s"username=${jaasQuote(user)} password=${jaasQuote(pass)};"))
    }
    Kafka(servers, opts)
  }

  /** Parse `schema_registry.json`: `{url, user, password}`. */
  def parseRegistry(json: String): Registry = {
    val n = new ObjectMapper().readTree(json)
    Registry(
      field(n, "url").getOrElse(throw new IllegalArgumentException(
        "schema_registry.json: url required")),
      field(n, "user"), field(n, "password"))
  }

  def loadKafka(dir: String): Option[Kafka] =
    load(dir, "kafka.json").map(parseKafka)

  def loadRegistry(dir: String): Option[Registry] =
    load(dir, "schema_registry.json").map(parseRegistry)

  private def load(dir: String, name: String): Option[String] = {
    val p = Paths.get(dir, name)
    if (Files.exists(p)) Some(new String(Files.readAllBytes(p))) else None
  }
}
