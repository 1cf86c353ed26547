package graft.streaming

/** Broker admin surface (ref fifo/admin.go:13-31 `CreateMissingTopics`,
  * fifo/consumer.go:184-227 `Watermarks`): topic creation and offset
  * watermarks, the two admin calls the sync loops need. [[MemoryBus]] and
  * [[FileBus]] implement it natively; [[KafkaAdmin]] backs [[KafkaBus]]
  * against a real broker.
  */
trait BusAdmin {
  /** Create any of `topics` that don't exist; existing topics are not an
    * error (ref fifo/admin.go:26 tolerates kerr.TopicAlreadyExists).
    */
  def createMissingTopics(topics: Seq[String], partitions: Int = 1,
      replication: Short = 1): Unit

  /** First retained offset per topic (low watermark). */
  def startOffsets(topics: Seq[String]): Map[String, Long]

  /** Next offset to be produced per topic (high watermark). */
  def endOffsets(topics: Seq[String]): Map[String, Long]

  /** (low, high) watermarks, ref fifo/consumer.go:184-196. */
  def watermarks(topic: String): (Long, Long) =
    (startOffsets(Seq(topic))(topic), endOffsets(Seq(topic))(topic))
}

/** Kafka AdminClient-backed [[BusAdmin]], bound via reflection so the
  * library has no compile-time dependency on kafka-clients (Spark pulls it
  * in only when the kafka connector is deployed). Every call opens and
  * closes one AdminClient — these are rare control-plane operations.
  *
  * Offsets are read for partition 0 only: the sync contract pins every
  * topic to one partition for FIFO ordering (fifo/consumer.go:59-62), so
  * the reference's min/max across partitions collapses to partition 0.
  */
final class KafkaAdmin(bootstrapServers: String,
    extraOptions: Map[String, String] = Map.empty) extends BusAdmin {

  private def props: java.util.Properties = {
    val p = new java.util.Properties()
    p.put("bootstrap.servers", bootstrapServers)
    // Spark reader options carry client properties under a "kafka." prefix;
    // AdminClient wants them bare.
    extraOptions.foreach { case (k, v) =>
      if (k.startsWith("kafka.")) p.put(k.stripPrefix("kafka."), v)
    }
    p
  }

  private def cls(name: String): Class[_] =
    try Class.forName(name)
    catch {
      case _: ClassNotFoundException =>
        throw new UnsupportedOperationException(
          s"KafkaAdmin needs kafka-clients on the classpath (missing $name); " +
            "deploy with the spark-sql-kafka connector")
    }

  private def withAdmin[A](f: AnyRef => A): A = {
    val adminCls = cls("org.apache.kafka.clients.admin.AdminClient")
    val admin = adminCls.getMethod("create", classOf[java.util.Properties])
      .invoke(null, props)
    try f(admin)
    finally admin.getClass.getMethod("close").invoke(admin)
  }

  /** result.all().get() via reflection, unwrapping InvocationTargetException. */
  private def await(result: AnyRef): AnyRef = {
    val future = result.getClass.getMethod("all").invoke(result)
    try future.getClass.getMethod("get").invoke(future)
    catch {
      case e: java.lang.reflect.InvocationTargetException => throw e.getCause
    }
  }

  override def createMissingTopics(topics: Seq[String], partitions: Int,
      replication: Short): Unit = withAdmin { admin =>
    val newTopic = cls("org.apache.kafka.clients.admin.NewTopic")
      .getConstructor(classOf[String], java.lang.Integer.TYPE, java.lang.Short.TYPE)
    val create = admin.getClass
      .getMethod("createTopics", classOf[java.util.Collection[_]])
    // one by one, like the reference (avoids one slow broker timing out the
    // whole batch, fifo/admin.go:18)
    topics.foreach { t =>
      val nt = newTopic.newInstance(t, Int.box(partitions), Short.box(replication))
      try await(create.invoke(admin, java.util.List.of(nt)))
      catch {
        case e: java.util.concurrent.ExecutionException
            if e.getCause != null && e.getCause.getClass.getName ==
              "org.apache.kafka.common.errors.TopicExistsException" => // fine
      }
    }
  }

  private def listOffsets(topics: Seq[String], spec: String): Map[String, Long] =
    withAdmin { admin =>
      val tpCtor = cls("org.apache.kafka.common.TopicPartition")
        .getConstructor(classOf[String], java.lang.Integer.TYPE)
      val specObj = cls("org.apache.kafka.clients.admin.OffsetSpec")
        .getMethod(spec).invoke(null)
      val query = new java.util.HashMap[AnyRef, AnyRef]()
      topics.foreach(t => query.put(tpCtor.newInstance(t, Int.box(0)).asInstanceOf[AnyRef], specObj))
      val listed = admin.getClass.getMethod("listOffsets", classOf[java.util.Map[_, _]])
        .invoke(admin, query)
      val all = await(listed).asInstanceOf[java.util.Map[AnyRef, AnyRef]]
      import scala.jdk.CollectionConverters._
      all.asScala.map { case (tp, info) =>
        val topic = tp.getClass.getMethod("topic").invoke(tp).asInstanceOf[String]
        val off = info.getClass.getMethod("offset").invoke(info)
          .asInstanceOf[java.lang.Long].longValue()
        topic -> off
      }.toMap
    }

  override def startOffsets(topics: Seq[String]): Map[String, Long] =
    listOffsets(topics, "earliest")

  override def endOffsets(topics: Seq[String]): Map[String, Long] =
    listOffsets(topics, "latest")
}
