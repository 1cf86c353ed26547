package graft

import graft.codecs.ConnectJson
import graft.streaming.{Bus, ConnectJsonCodec, FileBus, RawStringCodec}
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
  *   graft.Main consume-pool <lakeRoot> <pool> [-f zson|json|zng] [-o file]
  *   graft.Main produce <busRoot> <topic> <file>   # JSON-lines, .zson, .zng
  *   graft.Main consume <busRoot> <topic> [-f ...] [-o file] [-offset N]
  *                                   # -offset: -2 earliest (default), -1 latest
  *   graft.Main from-kafka <busRoot> <lakeRoot> <pool> <topic[,topic...]>
  *   graft.Main to-kafka <busRoot> <lakeRoot> <pool> <topic>
  *   graft.Main produce-avro <busRoot> <registryRoot> <topic> <file> [-namespace ns]
  *   graft.Main consume-avro <busRoot> <registryRoot> <topic> [-f ...] [-o file] [-offset N]
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
  /** Library/CLI version, printed by `graft.Main version` (parity with the
    * reference's `zync version` command, cmd/zync/version).
    */
  val Version = "0.3.0"

  def main(args: Array[String]): Unit = {
    if (args.isEmpty) { usage(); sys.exit(2) }
    val spark = GraftSession.local()
    try run(spark, args.toList)
    finally spark.stop()
  }

  private def usage(): Unit =
    System.err.println(
      "usage: graft.Main [-config <dir>] <etl|etl-plan|ls|info|compact|" +
        "consume-pool|produce|consume|from-kafka|to-kafka|stream-txn|" +
        "version> args...")

  /** Value schema of a topic's first message (Connect-JSON is
    * self-describing — the reference's inline-schema authority).
    */
  private def sniffTopic(spark: SparkSession, bus: Bus, topic: String): Option[StructType] = {
    import org.apache.spark.sql.functions.col
    bus.readBatch(spark, Seq(topic), Map.empty)
      .orderBy("offset").select(col("value").cast("string")).limit(1)
      .collect().headOption
      .map(r => ConnectJson.sniffSchema(r.getString(0)).asInstanceOf[StructType])
  }

  /** Key codec from the first non-null key: Connect-JSON when the bytes
    * carry an envelope, raw string otherwise (produce writes null keys).
    */
  private def sniffKeyCodec(spark: SparkSession, bus: Bus,
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

  /** One pass, or poll passes until `exitAfterMs` elapses (the
    * reference's `-exitafter`, from-kafka/command.go:74; 0/absent = one
    * pass). Per-key counts accumulate across passes.
    */
  private def syncLoop(exitAfterMs: Option[Long])(
      pass: => Seq[(String, Long)]): Map[String, Long] =
    exitAfterMs.filter(_ > 0) match {
      case None => pass.groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
      case Some(ms) =>
        val deadline = System.nanoTime() + ms * 1000000L
        val acc = scala.collection.mutable.Map.empty[String, Long]
        while (System.nanoTime() < deadline) {
          pass.foreach { case (k, v) => acc(k) = acc.getOrElse(k, 0L) + v }
          if (System.nanoTime() < deadline) Thread.sleep(25)
        }
        acc.toMap
    }

  /** Trailing `-flag value` options (a subset of the reference's zed
    * outputflags: `-f` format, `-o` output path, `-offset` start offset).
    */
  private def parseOpts(rest: List[String],
      allowed: Set[String]): Map[String, String] =
    rest.grouped(2).map {
      case List(k, v) if allowed(k) => k -> v
      case List(k, _) if k.startsWith("-") =>
        throw new IllegalArgumentException(
          s"unknown option $k (expected one of ${allowed.toSeq.sorted.mkString(", ")})")
      case other =>
        throw new IllegalArgumentException(s"bad option: ${other.mkString(" ")}")
    }.toMap

  /** Write a consume envelope in the requested output format. ZSON and
    * JSON stream line-by-line to Console.out (or `-o`); ZNG writes the
    * binary stream. All three paths iterate `toLocalIterator` — nothing
    * buffers the full result on the driver.
    */
  private def emit(df: org.apache.spark.sql.DataFrame,
      opts: Map[String, String]): Unit = {
    def withOut(f: java.io.OutputStream => Unit): Unit = opts.get("-o") match {
      case Some(p) =>
        val os = new java.io.BufferedOutputStream(
          java.nio.file.Files.newOutputStream(java.nio.file.Paths.get(p)))
        try f(os) finally os.close()
      case None => f(Console.out)
    }
    def lines(it: Iterator[String]): Unit = withOut { os =>
      val w = new java.io.PrintStream(os, false, "UTF-8")
      it.foreach(w.println); w.flush()
    }
    opts.getOrElse("-f", "zson") match {
      case "zson" => lines(graft.zson.Zson.renderAll(df))
      case "json" =>
        import scala.jdk.CollectionConverters._
        lines(df.toJSON.toLocalIterator().asScala)
      case "zng" => withOut(os => graft.zson.Zng.write(df, os))
      case other =>
        throw new IllegalArgumentException(s"unknown format $other (zson|json|zng)")
    }
  }

  /** Strip the optional leading `-config <dir>` flag (the reference reads
    * the same two files from `~/.zync/`; we take the directory explicitly
    * so tests and multi-cluster use stay easy). When `kafka.json` is
    * present, bus commands talk to that broker (the `<busRoot>` positional
    * is ignored — pass `-`); when `schema_registry.json` is present, the
    * avro commands use the Confluent REST registry instead of the
    * file-backed one.
    */
  private[graft] def run(spark: SparkSession, args: List[String]): Unit = args match {
    case "-config" :: dir :: rest =>
      runWith(spark, Config.loadKafka(dir), Config.loadRegistry(dir), rest)
    case other => runWith(spark, None, None, other)
  }

  private def runWith(spark: SparkSession, kafkaConf: Option[Config.Kafka],
      regConf: Option[Config.Registry], args: List[String]): Unit = {
    def bus(busRoot: String): Bus =
      kafkaConf.map(_.bus).getOrElse(new FileBus(busRoot))
    def avroRegistry(regRoot: String): graft.codecs.SchemaRegistry =
      regConf.map(_.registry).getOrElse(new graft.codecs.FileSchemaRegistry(regRoot))
    dispatch(spark, bus, avroRegistry, args)
  }

  private def dispatch(spark: SparkSession, bus: String => Bus,
      avroRegistry: String => graft.codecs.SchemaRegistry,
      args: List[String]): Unit = args match {
    case "version" :: Nil =>
      println(s"graft $Version")
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
    case "consume-pool" :: root :: pool :: rest if rest.size % 2 == 0 =>
      val opts = parseOpts(rest, Set("-f", "-o"))
      val p = graft.lake.Pool.open(spark, root, pool)
      if (!p.isEmpty) emit(p.read().orderBy(p.key), opts)
    case "produce" :: busRoot :: topic :: fileArg :: Nil =>
      // ONE read for both the schema sniff and the send; `-` parses ZSON
      // straight off stdin (`zync produce -` parity). The Connect envelope
      // is self-describing downstream via df.schema.
      val df =
        if (fileArg == "-")
          graft.zson.ZsonValue.toDataFrame(spark,
            Iterator.continually(Console.in.readLine())
              .takeWhile(_ != null).mkString("\n"))
        else Commands.readInput(spark, fileArg)
      val n = Commands.produceDF(bus(busRoot), topic, df,
        RawStringCodec, new ConnectJsonCodec(df.schema))
      println(s"produced ${n.values.sum} records to $topic")
    case "consume" :: busRoot :: topic :: rest if rest.size % 2 == 0 =>
      val opts = parseOpts(rest, Set("-f", "-o", "-offset"))
      val b = bus(busRoot)
      // reference offset sentinels (etl.KafkaOffsetEarliest/-Latest)
      val offset = opts.get("-offset").map(_.toLong).getOrElse(-2L) match {
        case -2L => 0L
        case -1L => b.endOffsets(spark, Seq(topic))(topic)
        case n => n
      }
      sniffTopic(spark, b, topic) match {
        case None => // empty topic, nothing to print
        case Some(schema) =>
          emit(Commands.consumeDF(spark, b, topic,
            sniffKeyCodec(spark, b, topic), new ConnectJsonCodec(schema),
            offset), opts)
      }
    // YAML-routing form (ref from-kafka/command.go:100-113: transform
    // configs derive the pool→topics map): sync every input topic of the
    // transform into its pool. `-exitafter <ms>` keeps polling until the
    // deadline (ref -exitafter duration flag).
    case "from-kafka" :: busRoot :: lakeRoot :: yamlPath :: rest
        if (yamlPath.endsWith(".yaml") || yamlPath.endsWith(".yml")) &&
          rest.size % 2 == 0 =>
      val opts = parseOpts(rest, Set("-exitafter"))
      val yaml = new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(yamlPath)))
      val routes = graft.etl.Transform.fromYaml(yaml).inputs
        .groupBy(_.pool).view.mapValues(_.map(_.topic).distinct).toMap
      val b = bus(busRoot)
      val counts = syncLoop(opts.get("-exitafter").map(_.toLong)) {
        routes.toSeq.flatMap { case (pool, topics) =>
          topics.flatMap { topic =>
            sniffTopic(spark, b, topic).map { schema =>
              pool -> Commands.fromKafka(spark, b, lakeRoot,
                Map(pool -> Seq(topic)), RawStringCodec,
                new ConnectJsonCodec(schema), None).values.sum
            }
          }
        }
      }
      counts.toSeq.sortBy(_._1).foreach { case (pool, n) =>
        println(s"synced $n records into $pool")
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
      val b = bus(busRoot)
      val counts = topicsArg.split(',').toSeq.map { topic =>
        sniffTopic(spark, b, topic) match {
          case None => topic -> 0L
          case Some(schema) =>
            topic -> Commands.fromKafka(spark, b, lakeRoot,
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
        val n = Commands.toKafka(spark, bus(busRoot), lakeRoot, pool, topic,
          new ConnectJsonCodec(structOf("key")), new ConnectJsonCodec(structOf("value")))
        println(s"produced $n records to $topic")
      }
    case "produce-avro" :: busRoot :: regRoot :: topic :: file :: rest
        if rest.size % 2 == 0 =>
      // -namespace: Avro namespace for new schemas (ref cli/flags.go:32,
      // default io.brimdata.zync; ours defaults to the historical
      // "namespace" used by existing registries/goldens)
      val ns = parseOpts(rest, Set("-namespace")).getOrElse("-namespace", "namespace")
      val df = Commands.readInput(spark, file)
      val registry = avroRegistry(regRoot)
      val n = Commands.produceDF(bus(busRoot), topic, df,
        RawStringCodec,
        new graft.streaming.RegistryAvroCodec(df.schema, ns, registry))
      println(s"produced ${n.values.sum} records to $topic")
    case "consume-avro" :: busRoot :: regRoot :: topic :: rest
        if rest.size % 2 == 0 =>
      val opts = parseOpts(rest, Set("-f", "-o", "-offset"))
      val b = bus(busRoot)
      val registry = avroRegistry(regRoot)
      import org.apache.spark.sql.functions.col
      val offset = opts.get("-offset").map(_.toLong).getOrElse(-2L) match {
        case -2L => 0L
        case -1L => b.endOffsets(spark, Seq(topic))(topic)
        case n => n
      }
      // recover the value type from the first message's embedded schema id
      val first = b.readBatch(spark, Seq(topic), Map.empty)
        .orderBy("offset").select("value").limit(1)
        .collect().headOption.map(_.getAs[Array[Byte]](0))
      first match {
        case None => // empty topic
        case Some(msg) =>
          val (id, _) = graft.codecs.ZAvro.unframe(msg)
          val avro = new org.apache.avro.Schema.Parser().parse(registry.getSchema(id))
          val schema = graft.codecs.ZAvro.avroToSpark(avro).asInstanceOf[StructType]
          emit(Commands.consumeDF(spark, b, topic, RawStringCodec,
            new graft.streaming.RegistryAvroCodec(schema, "namespace", registry),
            offset), opts)
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
      val high = bus(busRoot).endOffsets(spark, Seq(topic))(topic)
      println(s"low 0 high $high")
    case "stream-txn" :: inDir :: outDir :: rest =>
      // Streaming transaction assembly over a JSON event directory (the
      // file-stream analogue of a topic): bundles to outDir/bundles as
      // parquet, dead-letters included (`complete=false`). `-metrics`
      // dumps the StreamMetrics counters + engine state gauge after the
      // run — the user-facing surface of the ops accumulators.
      val wantMetrics = rest.contains("-metrics")
      val opts = parseOpts(rest.filterNot(_ == "-metrics"), Set("-ttl"))
      val ttlMs = opts.get("-ttl").map(_.toLong).getOrElse(60000L)
      import spark.implicits._
      val metrics = new graft.streaming.StreamMetrics.TxnMetrics(spark)
      val gauge = new graft.streaming.StreamMetrics.StateGaugeListener
      spark.streams.addListener(gauge)
      val stream = spark.readStream
        .schema("txn LONG, seqno LONG, payload STRING, done BOOLEAN, ts TIMESTAMP")
        .json(inDir)
        .withWatermark("ts", "2 seconds")
        .as[graft.streaming.TxnOps.TimedTxnEvent]
      val q = graft.streaming.TxnOps
        .assembleStreamWithTtl(stream, ttlMs, Some(metrics))
        .writeStream.outputMode("append").format("parquet")
        .option("path", s"$outDir/bundles")
        .option("checkpointLocation", s"$outDir/_checkpoint")
        .start()
      try q.processAllAvailable() finally {
        q.stop(); spark.streams.removeListener(gauge)
      }
      val emitted = spark.read.parquet(s"$outDir/bundles")
      println(s"assembled ${emitted.count()} bundles into $outDir/bundles")
      if (wantMetrics) {
        println(s"metrics txn.completed=${metrics.completed.value} " +
          s"txn.timedOut=${metrics.timedOut.value} " +
          s"txn.inFlight=${metrics.inFlight.value} " +
          s"state.rows=${gauge.stateRows(q.id).getOrElse(0L)} " +
          s"state.rowsUpdatedLastBatch=${gauge.rowsUpdatedLastBatch}")
      }
    case other =>
      System.err.println(s"unknown command: ${other.mkString(" ")}")
      usage()
      sys.exit(2)
  }
}
