package graft

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite

/** Config-file parsing parity with the reference's `~/.zync/` files
  * (cli/flags.go:28-130): kafka.json → Spark Kafka options, and
  * schema_registry.json → Confluent REST endpoint + basic auth.
  */
class ConfigSpec extends AnyFunSuite {

  test("kafka.json with SASL_SSL maps to Spark Kafka options") {
    val k = Config.parseKafka(
      """{"bootstrap_servers": "b1:9092,b2:9092",
         |"security_protocol": "SASL_SSL",
         |"sasl_mechanisms": "PLAIN",
         |"sasl_username": "alice",
         |"sasl_password": "s3cret"}""".stripMargin)
    assert(k.bootstrapServers == "b1:9092,b2:9092")
    assert(k.options("kafka.security.protocol") == "SASL_SSL")
    assert(k.options("kafka.sasl.mechanism") == "PLAIN")
    assert(k.options("kafka.sasl.jaas.config") ==
      "org.apache.kafka.common.security.plain.PlainLoginModule required " +
        """username="alice" password="s3cret";""")
  }

  test("JAAS values escape quotes and backslashes in credentials") {
    // username al"ice, password p\w;d (JSON-escaped below)
    val k = Config.parseKafka(
      """{"bootstrap_servers": "b", "security_protocol": "SASL_PLAINTEXT",
         |"sasl_mechanisms": "PLAIN",
         |"sasl_username": "al\"ice",
         |"sasl_password": "p\\w;d"}""".stripMargin)
    val jaas = k.options("kafka.sasl.jaas.config")
    assert(jaas.contains("username=\"al\\\"ice\""), jaas)
    assert(jaas.contains("password=\"p\\\\w;d\""), jaas)
  }

  test("kafka.json defaults to PLAINTEXT with no sasl options") {
    val k = Config.parseKafka("""{"bootstrap_servers": "localhost:9092"}""")
    assert(k.options == Map("kafka.security.protocol" -> "PLAINTEXT"))
  }

  test("unknown security_protocol and sasl_mechanisms are errors (ref parity)") {
    val e1 = intercept[IllegalArgumentException](Config.parseKafka(
      """{"bootstrap_servers": "b", "security_protocol": "KERBEROS"}"""))
    assert(e1.getMessage.contains("security_protocol"))
    val e2 = intercept[IllegalArgumentException](Config.parseKafka(
      """{"bootstrap_servers": "b", "security_protocol": "SASL_PLAINTEXT",
         |"sasl_mechanisms": "SCRAM-SHA-256"}""".stripMargin))
    assert(e2.getMessage.contains("sasl_mechanisms"))
    intercept[IllegalArgumentException](Config.parseKafka("{}"))
  }

  test("schema_registry.json parses url + api key into basic auth") {
    val r = Config.parseRegistry(
      """{"url": "https://reg.example", "user": "key", "password": "pw"}""")
    assert(r.url == "https://reg.example")
    // base64("key:pw")
    assert(r.registry.authHeader.contains("Basic a2V5OnB3"))
  }

  test("registry without credentials sends no auth header") {
    val r = Config.parseRegistry("""{"url": "http://localhost:8081"}""")
    assert(r.registry.authHeader.isEmpty)
  }

  test("loadKafka/loadRegistry read a -config directory; absent files -> None") {
    val dir = Files.createTempDirectory("graft-config")
    assert(Config.loadKafka(dir.toString).isEmpty)
    assert(Config.loadRegistry(dir.toString).isEmpty)
    Files.write(dir.resolve("kafka.json"),
      """{"bootstrap_servers": "broker:9092"}""".getBytes)
    Files.write(dir.resolve("schema_registry.json"),
      """{"url": "http://r", "user": "u", "password": "p"}""".getBytes)
    assert(Config.loadKafka(dir.toString).map(_.bootstrapServers)
      .contains("broker:9092"))
    assert(Config.loadRegistry(dir.toString).map(_.url).contains("http://r"))
  }
}
