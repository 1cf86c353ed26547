package graft

import graft.codecs.ConnectJson
import graft.streaming.{ConnectJsonCodec, FileBus, RawStringCodec}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types.StructType

/** CLI entry point mirroring the zync command set (`zync <cmd> ...`):
  *
  * {{{
  *   graft.Main etl <lakeRoot> <transform.yaml>
  *   graft.Main etl-plan <lakeRoot> <transform.yaml>
  *   graft.Main ls <lakeRoot>
  *   graft.Main info <lakeRoot> <pool>
  *   graft.Main compact <lakeRoot> <pool>
  *   graft.Main consume-pool <lakeRoot> <pool>     # ZSON to stdout
  *   graft.Main produce <busRoot> <topic> <file>   # JSON-lines or .zson
  *   graft.Main consume <busRoot> <topic>          # ZSON to stdout
  *   graft.Main from-kafka <busRoot> <lakeRoot> <pool> <topic[,topic...]>
  *   graft.Main to-kafka <busRoot> <lakeRoot> <pool> <topic>
  *   graft.Main produce-avro <busRoot> <registryRoot> <topic> <file>
  *   graft.Main consume-avro <busRoot> <registryRoot> <topic>
  *   graft.Main schemas <registryRoot>             # zync ls parity
  *   graft.Main topic-info <busRoot> <topic>       # zync info parity
  * }}}
  *
  * The bus commands run against a durable [[graft.streaming.FileBus]]
  * directory, so the full zync workflow works across process invocations
  * without a broker; swap in [[graft.streaming.KafkaBus]] when connector
  * jars and brokers exist. Message values travel as Connect-JSON, so
  * consumers recover schemas from the self-describing envelope.
  */
object Main {
  def main(args: Array[String]): Unit = {
    if (args.isEmpty) { usage(); sys.exit(2) }
    val spark = GraftSession.local()
    try run(spark, args.toList)
    finally spark.stop()
  }

  private def usage(): Unit =
    System.err.println(
      "usage: graft.Main <etl|etl-plan|ls|info|compact|consume-pool|" +
        "produce|consume|from-kafka|to-kafka> args...")

  /** Value schema of a topic's first message (Connect-JSON is
    * self-describing — the reference's inline-schema authority).
    */
  private def sniffTopic(spark: SparkSession, bus: FileBus, topic: String): Option[StructType] = {
    import org.apache.spark.sql.functions.col
    bus.readBatch(spark, Seq(topic), Map.empty)
      .orderBy("offset").select(col("value").cast("string")).limit(1)
      .collect().headOption
      .map(r => ConnectJson.sniffSchema(r.getString(0)).asInstanceOf[StructType])
  }

  /** Key codec from the first non-null key: Connect-JSON when the bytes
    * carry an envelope, raw string otherwise (produce writes null keys).
    */
  private def sniffKeyCodec(spark: SparkSession, bus: FileBus,
      topic: String): graft.streaming.EnvelopeCodec = {
    import org.apache.spark.sql.functions.col
    val first = bus.readBatch(spark, Seq(topic), Map.empty)
      .filter(col("key").isNotNull)
      .orderBy("offset").select(col("key").cast("string")).limit(1)
      .collect().headOption.map(_.getString(0))
    first.flatMap(k => scala.util.Try(
      new ConnectJsonCodec(ConnectJson.sniffSchema(k))).toOption)
      .getOrElse(RawStringCodec)
  }

  private[graft] def run(spark: SparkSession, args: List[String]): Unit = args match {
    case "etl" :: root :: yamlPath :: Nil =>
      val yaml = new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(yamlPath)))
      val n = Commands.etl(spark, root, yaml)
      println(s"ETL'd $n records")
    case "etl-plan" :: root :: yamlPath :: Nil =>
      val yaml = new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(yamlPath)))
      println(Commands.etlPlan(spark, root, yaml))
    case "ls" :: root :: Nil =>
      Commands.ls(root).foreach(println)
    case "info" :: root :: pool :: Nil =>
      Commands.info(spark, root, pool).toSeq.sortBy(_._1)
        .foreach { case (k, v) => println(s"$k: $v") }
    case "compact" :: root :: pool :: Nil =>
      val p = graft.lake.Pool.open(spark, root, pool)
      val id = p.compact()
      val removed = p.vacuum()
      println(s"compacted at commit $id, vacuumed $removed files")
    case "consume-pool" :: root :: pool :: Nil =>
      val p = graft.lake.Pool.open(spark, root, pool)
      if (!p.isEmpty)
        graft.zson.Zson.renderAll(p.read().orderBy(p.key)).foreach(println)
    case "produce" :: busRoot :: topic :: file :: Nil =>
      // infer the value schema from the file so the Connect envelope is
      // self-describing downstream
      val df = if (file.endsWith(".zson")) graft.zson.ZsonValue.read(spark, file)
        else spark.read.json(file)
      val n = Commands.produce(spark, new FileBus(busRoot), topic, file,
        RawStringCodec, new ConnectJsonCodec(df.schema))
      println(s"produced ${n.values.sum} records to $topic")
    case "consume" :: busRoot :: topic :: Nil =>
      val bus = new FileBus(busRoot)
      sniffTopic(spark, bus, topic) match {
        case None => // empty topic, nothing to print
        case Some(schema) =>
          Commands.consume(spark, bus, topic, sniffKeyCodec(spark, bus, topic),
            new ConnectJsonCodec(schema)).foreach(println)
      }
    case "from-kafka" :: busRoot :: lakeRoot :: pool :: topicsArg :: rest
        if rest.size <= 1 =>
      // optional trailing arg = in-flight shaper (the reference's -shaper
      // Zed script): a SQL query over the envelope view `this`
      val shaper = rest.headOption.map { sql =>
        (df: org.apache.spark.sql.DataFrame) => {
          df.createOrReplaceTempView("this")
          df.sparkSession.sql(sql)
        }
      }
      val bus = new FileBus(busRoot)
      val counts = topicsArg.split(',').toSeq.map { topic =>
        sniffTopic(spark, bus, topic) match {
          case None => topic -> 0L
          case Some(schema) =>
            topic -> Commands.fromKafka(spark, bus, lakeRoot,
              Map(pool -> Seq(topic)), RawStringCodec,
              new ConnectJsonCodec(schema), shaper).values.sum
        }
      }
      counts.foreach { case (t, n) => println(s"synced $n records from $t into $pool") }
    case "to-kafka" :: busRoot :: lakeRoot :: pool :: topic :: Nil =>
      val p = graft.lake.Pool.open(spark, lakeRoot, pool)
      if (p.isEmpty) println(s"produced 0 records to $topic")
      else {
        val schema = p.read().schema
        def structOf(name: String): StructType =
          schema.find(_.name == name).map(_.dataType.asInstanceOf[StructType])
            .getOrElse(new StructType())
        val n = Commands.toKafka(spark, new FileBus(busRoot), lakeRoot, pool, topic,
          new ConnectJsonCodec(structOf("key")), new ConnectJsonCodec(structOf("value")))
        println(s"produced $n records to $topic")
      }
    case "produce-avro" :: busRoot :: regRoot :: topic :: file :: Nil =>
      val df = if (file.endsWith(".zson")) graft.zson.ZsonValue.read(spark, file)
        else spark.read.json(file)
      val registry = new graft.codecs.FileSchemaRegistry(regRoot)
      val n = Commands.produce(spark, new FileBus(busRoot), topic, file,
        RawStringCodec,
        new graft.streaming.RegistryAvroCodec(df.schema, "namespace", registry))
      println(s"produced ${n.values.sum} records to $topic")
    case "consume-avro" :: busRoot :: regRoot :: topic :: Nil =>
      val bus = new FileBus(busRoot)
      val registry = new graft.codecs.FileSchemaRegistry(regRoot)
      import org.apache.spark.sql.functions.col
      // recover the value type from the first message's embedded schema id
      val first = bus.readBatch(spark, Seq(topic), Map.empty)
        .orderBy("offset").select("value").limit(1)
        .collect().headOption.map(_.getAs[Array[Byte]](0))
      first match {
        case None => // empty topic
        case Some(msg) =>
          val (id, _) = graft.codecs.ZAvro.unframe(msg)
          val avro = new org.apache.avro.Schema.Parser().parse(registry.getSchema(id))
          val schema = graft.codecs.ZAvro.avroToSpark(avro).asInstanceOf[StructType]
          Commands.consume(spark, bus, topic, RawStringCodec,
            new graft.streaming.RegistryAvroCodec(schema, "namespace", registry))
            .foreach(println)
      }
    case "schemas" :: regRoot :: Nil =>
      // zync ls parity: subjects with the latest schema of each
      val registry = new graft.codecs.FileSchemaRegistry(regRoot)
      registry.subjects().foreach { s =>
        println(s"subject $s:")
        registry.versions(s).lastOption.foreach { case (version, id) =>
          println(s"  id $id")
          println(s"  version $version")
          println(s"  schema ${registry.getSchema(id)}")
        }
      }
    case "topic-info" :: busRoot :: topic :: Nil =>
      // zync info parity: low and high watermarks
      val high = new FileBus(busRoot).endOffsets(spark, Seq(topic))(topic)
      println(s"low 0 high $high")
    case other =>
      System.err.println(s"unknown command: ${other.mkString(" ")}")
      usage()
      sys.exit(2)
  }
}
