// Test-classpath stand-ins for the kafka-clients admin API: just enough of
// the real class/method shapes (same fully-qualified names, same
// signatures) that graft.streaming.KafkaAdmin's reflection binds against
// them — proving the seam works without a kafka-clients jar in this
// zero-egress environment. State lives in graft.streaming.FakeBroker.

package graft.streaming {
  import scala.collection.concurrent.TrieMap

  /** Shared state behind the kafka-clients stubs. */
  object FakeBroker {
    /** topic -> (startOffset, endOffset) */
    val topics = TrieMap.empty[String, (Long, Long)]
    @volatile var lastProps: java.util.Properties = _
    /** Injected broker failure for the next createTopics / listOffsets. */
    @volatile var failNextCreate: Throwable = _
    @volatile var failNextListOffsets: Throwable = _
    /** AdminClient lifecycle counters: every create must be closed, even
      * on error paths.
      */
    val created = new java.util.concurrent.atomic.AtomicInteger
    val closed = new java.util.concurrent.atomic.AtomicInteger
    def reset(): Unit = {
      topics.clear(); lastProps = null
      failNextCreate = null; failNextListOffsets = null
      created.set(0); closed.set(0)
    }
  }
}

package org.apache.kafka.common {
  class TopicPartition(t: String, p: Int) {
    def topic(): String = t
    def partition(): Int = p
  }

  package errors {
    class TopicExistsException(msg: String) extends RuntimeException(msg)
  }
}

package org.apache.kafka.clients.admin {
  import graft.streaming.FakeBroker
  import org.apache.kafka.common.TopicPartition
  import org.apache.kafka.common.errors.TopicExistsException
  import scala.jdk.CollectionConverters._

  class KafkaFutureStub[T](value: T, err: Throwable) {
    def get(): T = if (err != null) throw err else value
  }

  class NewTopic(n: String, partitions: Int, replication: Short) {
    def name(): String = n
  }

  class CreateTopicsResult(err: Throwable) {
    def all(): KafkaFutureStub[Void] = new KafkaFutureStub(null, err)
  }

  class OffsetSpec(val kind: String)
  object OffsetSpec {
    def latest(): OffsetSpec = new OffsetSpec("latest")
    def earliest(): OffsetSpec = new OffsetSpec("earliest")
  }

  class ListOffsetsResultInfo(off: Long) {
    def offset(): Long = off
  }

  class ListOffsetsResult(m: java.util.Map[TopicPartition, ListOffsetsResultInfo],
      err: Throwable = null) {
    def all(): KafkaFutureStub[java.util.Map[TopicPartition, ListOffsetsResultInfo]] =
      new KafkaFutureStub(m, err)
  }

  class AdminClient(props: java.util.Properties) {
    FakeBroker.lastProps = props
    FakeBroker.created.incrementAndGet()

    def createTopics(ts: java.util.Collection[NewTopic]): CreateTopicsResult = {
      if (FakeBroker.failNextCreate != null) {
        val err = FakeBroker.failNextCreate
        FakeBroker.failNextCreate = null
        return new CreateTopicsResult(
          new java.util.concurrent.ExecutionException(err))
      }
      val err = ts.asScala.flatMap { nt =>
        if (FakeBroker.topics.putIfAbsent(nt.name(), (0L, 0L)).isDefined)
          Some(new java.util.concurrent.ExecutionException(
            new TopicExistsException(nt.name())))
        else None
      }.headOption
      new CreateTopicsResult(err.orNull)
    }

    def listOffsets(q: java.util.Map[TopicPartition, OffsetSpec]): ListOffsetsResult = {
      if (FakeBroker.failNextListOffsets != null) {
        // real brokers surface ListOffsets failures in the KafkaFuture,
        // not synchronously
        val err = FakeBroker.failNextListOffsets
        FakeBroker.failNextListOffsets = null
        return new ListOffsetsResult(null,
          new java.util.concurrent.ExecutionException(err))
      }
      val out = new java.util.HashMap[TopicPartition, ListOffsetsResultInfo]()
      q.asScala.foreach { case (tp, spec) =>
        val (start, end) = FakeBroker.topics.getOrElse(tp.topic(), (0L, 0L))
        out.put(tp, new ListOffsetsResultInfo(if (spec.kind == "latest") end else start))
      }
      new ListOffsetsResult(out)
    }

    def close(): Unit = { FakeBroker.closed.incrementAndGet(); () }
  }

  object AdminClient {
    def create(props: java.util.Properties): AdminClient = new AdminClient(props)
  }
}
