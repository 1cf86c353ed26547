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

  /** The complete reflective binding surface of [[KafkaAdmin]], pinned
    * (class, member, exact parameter types). If any bound signature drifts
    * — in the binding code or in the kafka-clients API shape on the
    * classpath — this enumeration stops resolving and the test fails.
    */
  test("signature pin: every reflectively bound member resolves with exact types") {
    def c(n: String) = Class.forName(n)
    val admin = c("org.apache.kafka.clients.admin.AdminClient")
    // AdminClient.create(Properties) / close()
    assert(admin.getMethod("create", classOf[java.util.Properties]) != null)
    assert(admin.getMethod("close") != null)
    // createTopics(Collection) -> CreateTopicsResult.all().get()
    val ctr = admin.getMethod("createTopics", classOf[java.util.Collection[_]])
    assert(ctr.getReturnType.getMethod("all").getReturnType.getMethod("get") != null)
    // listOffsets(Map) -> ListOffsetsResult.all().get()
    val lor = admin.getMethod("listOffsets", classOf[java.util.Map[_, _]])
    assert(lor.getReturnType.getMethod("all").getReturnType.getMethod("get") != null)
    // NewTopic(String, int, short)
    assert(c("org.apache.kafka.clients.admin.NewTopic").getConstructor(
      classOf[String], java.lang.Integer.TYPE, java.lang.Short.TYPE) != null)
    // TopicPartition(String, int) + .topic()
    val tp = c("org.apache.kafka.common.TopicPartition")
    assert(tp.getConstructor(classOf[String], java.lang.Integer.TYPE) != null)
    assert(tp.getMethod("topic").getReturnType == classOf[String])
    // OffsetSpec.latest()/earliest() statics
    val spec = c("org.apache.kafka.clients.admin.OffsetSpec")
    assert(java.lang.reflect.Modifier.isStatic(spec.getMethod("latest").getModifiers))
    assert(java.lang.reflect.Modifier.isStatic(spec.getMethod("earliest").getModifiers))
    // ListOffsetsResultInfo.offset()
    assert(c("org.apache.kafka.clients.admin.ListOffsetsResultInfo")
      .getMethod("offset") != null)
    // the one error type matched BY NAME in the binding
    assert(c("org.apache.kafka.common.errors.TopicExistsException") != null)
  }

  test("broker errors other than TopicExists propagate; the client still closes") {
    FakeBroker.reset()
    val admin = new KafkaAdmin("broker:9092")
    FakeBroker.failNextCreate =
      new RuntimeException("TOPIC_AUTHORIZATION_FAILED")
    val e = intercept[java.util.concurrent.ExecutionException] {
      admin.createMissingTopics(Seq("forbidden"))
    }
    assert(e.getCause.getMessage.contains("TOPIC_AUTHORIZATION_FAILED"))
    assert(FakeBroker.created.get() == FakeBroker.closed.get(),
      "AdminClient leaked on the error path")

    // ListOffsets failures surface through the KafkaFuture and propagate too
    FakeBroker.failNextListOffsets = new RuntimeException("NOT_LEADER_OR_FOLLOWER")
    val e2 = intercept[java.util.concurrent.ExecutionException] {
      admin.endOffsets(Seq("t"))
    }
    assert(e2.getCause.getMessage.contains("NOT_LEADER_OR_FOLLOWER"))
    assert(FakeBroker.created.get() == FakeBroker.closed.get())
  }

  test("every control-plane call opens exactly one AdminClient and closes it") {
    FakeBroker.reset()
    val admin = new KafkaAdmin("broker:9092")
    admin.createMissingTopics(Seq("x", "y")) // one client, two topics
    admin.endOffsets(Seq("x"))
    admin.startOffsets(Seq("y"))
    assert(FakeBroker.created.get() == 3)
    assert(FakeBroker.closed.get() == 3)
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
