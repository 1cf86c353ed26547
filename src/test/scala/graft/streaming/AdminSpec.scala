package graft.streaming

import graft.GraftSession
import org.scalatest.funsuite.AnyFunSuite

/** The broker admin seam (ref fifo/admin.go:13-31, fifo/consumer.go:184-227)
  * against the kafka-clients stubs on the test classpath: KafkaAdmin's
  * reflection binds the same fully-qualified names and signatures as the
  * real jar, so this proves the wiring, not just a fake.
  */
class AdminSpec extends AnyFunSuite {

  test("createMissingTopics creates new topics and tolerates existing ones") {
    FakeBroker.reset()
    val admin = new KafkaAdmin("broker:9092", Map("kafka.sasl.mechanism" -> "PLAIN"))
    admin.createMissingTopics(Seq("a", "b"))
    assert(FakeBroker.topics.keySet == Set("a", "b"))
    // client properties reach AdminClient.create with the kafka. prefix bare
    assert(FakeBroker.lastProps.get("bootstrap.servers") == "broker:9092")
    assert(FakeBroker.lastProps.get("sasl.mechanism") == "PLAIN")

    // second call: "a" exists (TopicExistsException swallowed), "c" created
    admin.createMissingTopics(Seq("a", "c"))
    assert(FakeBroker.topics.keySet == Set("a", "b", "c"))
  }

  test("watermark recovery: start/end offsets via ListOffsets") {
    FakeBroker.reset()
    FakeBroker.topics.put("t1", (3L, 17L))
    FakeBroker.topics.put("t2", (0L, 5L))
    val admin = new KafkaAdmin("broker:9092")
    assert(admin.endOffsets(Seq("t1", "t2")) == Map("t1" -> 17L, "t2" -> 5L))
    assert(admin.startOffsets(Seq("t1")) == Map("t1" -> 3L))
    assert(admin.watermarks("t1") == ((3L, 17L)))
  }

  test("KafkaBus.endOffsets no longer throws: it delegates to the admin") {
    FakeBroker.reset()
    FakeBroker.topics.put("out", (0L, 42L))
    val spark = GraftSession.local(2)
    val bus = new KafkaBus("broker:9092")
    assert(bus.endOffsets(spark, Seq("out")) == Map("out" -> 42L))
  }

  test("file and memory buses implement the same admin surface") {
    val mem = new MemoryBus
    mem.createMissingTopics(Seq("m1"))
    assert(mem.endOffsets(Seq("m1")) == Map("m1" -> 0L))
    mem.publish("m1", null, Array[Byte](1))
    assert(mem.watermarks("m1") == ((0L, 1L)))

    val root = java.nio.file.Files.createTempDirectory("admin-fb").toString
    val fb = new FileBus(root)
    fb.createMissingTopics(Seq("f1"))
    assert(fb.endOffsets(Seq("f1")) == Map("f1" -> 0L))
    fb.publish("f1", null, Array[Byte](2))
    fb.publish("f1", null, Array[Byte](3))
    assert(fb.watermarks("f1") == ((0L, 2L)))
  }
}
