package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** The full zync CLI workflow against the durable FileBus — each step is a
  * separate Main.run invocation (fresh bus instance each time, as separate
  * processes would see), no broker required.
  */
class MainCliSpec extends AnyFunSuite {

  lazy val spark: SparkSession = GraftSession.local(4)

  def capture(args: String*): Seq[String] = {
    val out = new java.io.ByteArrayOutputStream()
    Console.withOut(new java.io.PrintStream(out)) {
      Main.run(spark, args.toList)
    }
    new String(out.toByteArray).linesIterator.toSeq
  }

  test("version prints the library version") {
    assert(capture("version") == Seq(s"graft ${Main.Version}"))
  }

  test("-config with no config files falls back to the FileBus/file registry") {
    val dir = Files.createTempDirectory("cli-conf").toString
    assert(capture("-config", dir, "version") == Seq(s"graft ${Main.Version}"))
    val bus = Files.createTempDirectory("cli-conf-bus").toString
    // empty topic on the file bus via the config-aware path
    assert(capture("-config", dir, "topic-info", bus, "T") == Seq("low 0 high 0"))
  }

  test("produce - reads ZSON from stdin (zync produce - parity)") {
    val bus = Files.createTempDirectory("cli-stdin-bus").toString
    val in = new java.io.BufferedReader(
      new java.io.StringReader("{a:1} {b:2}\n{c:3}"))
    val out = Console.withIn(in) { capture("produce", bus, "S", "-") }
    assert(out == Seq("produced 3 records to S"))
    assert(capture("topic-info", bus, "S") == Seq("low 0 high 3"))
  }

  test("produce accepts .zng files with a correct sniffed envelope schema") {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val bus = Files.createTempDirectory("cli-zngp-bus").toString
    val schema = StructType(Seq(StructField("op", StringType), StructField("n", LongType)))
    val df = spark.createDataFrame(spark.sparkContext.parallelize(Seq(
      Row("c", 5L), Row("u", 6L)), 1), schema)
    val zng = Files.createTempFile("in", ".zng")
    graft.zson.Zng.write(df, zng.toString)
    assert(capture("produce", bus, "Z", zng.toString)
      == Seq("produced 2 records to Z"))
    // the Connect envelope carries the real schema, so consume decodes it
    val out = capture("consume", bus, "Z")
    assert(out == Seq(
      """{kafka:{topic:"Z",partition:0,offset:0},value:{op:"c",n:5}}""",
      """{kafka:{topic:"Z",partition:0,offset:1},value:{op:"u",n:6}}"""), out)
  }

  test("stream-txn -metrics surfaces the StreamMetrics counters") {
    val in = java.nio.file.Files.createTempDirectory("cli-txn-in")
    val out = java.nio.file.Files.createTempDirectory("cli-txn-out")
    def write(name: String, lines: Seq[String]): Unit = {
      val tmp = in.resolve(s".$name")
      java.nio.file.Files.write(tmp, lines.mkString("\n").getBytes)
      java.nio.file.Files.move(tmp, in.resolve(name))
    }
    // txn 1 completes; txn 2 stays in flight
    write("b1.json", Seq(
      """{"txn":1,"seqno":1,"payload":"a1","done":false,"ts":"2024-01-01T00:00:00Z"}""",
      """{"txn":1,"seqno":2,"payload":"a-end","done":true,"ts":"2024-01-01T00:00:01Z"}""",
      """{"txn":2,"seqno":1,"payload":"b1","done":false,"ts":"2024-01-01T00:00:02Z"}"""))
    val lines = capture("stream-txn", in.toString, out.toString,
      "-ttl", "60000", "-metrics")
    assert(lines.exists(_.startsWith("assembled 1 bundles")), lines.mkString("\n"))
    val m = lines.filter(_.startsWith("metrics "))
    assert(m.size == 1, lines.mkString("\n"))
    assert(m.head.contains("txn.completed=1"), m.head)
    assert(m.head.contains("txn.timedOut=0"), m.head)
    assert(m.head.contains("txn.inFlight=1"), m.head)
  }

  test("unknown option flags are rejected, not silently ignored") {
    val bus = Files.createTempDirectory("cli-badopt-bus").toString
    val e = intercept[IllegalArgumentException] {
      capture("consume", bus, "T", "-ofset", "5")
    }
    assert(e.getMessage.contains("-ofset"))
  }

  test("produce -> from-kafka -> etl -> to-kafka -> consume, all via CLI") {
    val bus = Files.createTempDirectory("cli-bus").toString
    val lake = Files.createTempDirectory("cli-lake").toString
    val recs = Files.createTempFile("recs", ".zson")
    Files.write(recs,
      """{op:"c",n:1}
        |{op:"c",n:2}
        |{op:"x",n:3}
        |""".stripMargin.getBytes)
    val yaml = Files.createTempFile("transform", ".yaml")
    Files.write(yaml,
      """inputs:
        |  - topic: T
        |    pool: Raw
        |output:
        |  topic: Out
        |  pool: Staging
        |transforms:
        |  - type: stateless
        |    where: value.op=="c"
        |    in: T
        |    out: Out
        |    zed: |
        |      | out:={ key: {n: in.value.n}, value: { doubled: sql:(in.value.n * 2) } }
        |""".stripMargin.getBytes)

    assert(capture("produce", bus, "T", recs.toString)
      == Seq("produced 3 records to T"))
    assert(capture("from-kafka", bus, lake, "Raw", "T")
      == Seq("synced 3 records from T into Raw"))
    assert(capture("etl", lake, yaml.toString) == Seq("ETL'd 4 records"))
    assert(capture("to-kafka", bus, lake, "Staging", "Out")
      == Seq("produced 2 records to Out"))
    assert(capture("consume", bus, "Out") == Seq(
      """{kafka:{topic:"Out",partition:0,offset:0},key:{n:1},value:{doubled:2}}""",
      """{kafka:{topic:"Out",partition:0,offset:1},key:{n:2},value:{doubled:4}}"""))

    // idempotent re-sync: nothing new anywhere
    assert(capture("from-kafka", bus, lake, "Raw", "T")
      == Seq("synced 0 records from T into Raw"))
    assert(capture("etl", lake, yaml.toString) == Seq("ETL'd 0 records"))

    // output-format flags (zed outputflags subset): json lines, zng binary
    val json = capture("consume", bus, "Out", "-f", "json")
    assert(json.size == 2 && json.forall(_.startsWith("""{"kafka":""")))
    assert(json.head.contains(""""doubled":2"""))
    // -offset skips to the given kafka offset; -1 (latest) yields nothing
    assert(capture("consume", bus, "Out", "-offset", "1").size == 1)
    assert(capture("consume", bus, "Out", "-offset", "-1").isEmpty)
    val zng = Files.createTempFile("out", ".zng")
    capture("consume", bus, "Out", "-f", "zng", "-o", zng.toString)
    val back = graft.zson.Zng.read(spark, zng.toString)
    assert(back.count() == 2)
    assert(back.select("value.doubled").orderBy("doubled")
      .collect().map(_.getLong(0)).toSeq == Seq(2L, 4L))
    // consume-pool honors the same flags (4 rows: 2 outputs + 2 done markers)
    val poolZng = Files.createTempFile("pool", ".zng")
    capture("consume-pool", lake, "Staging", "-f", "zng", "-o", poolZng.toString)
    assert(graft.zson.Zng.read(spark, poolZng.toString).count() == 4)
    assert(capture("to-kafka", bus, lake, "Staging", "Out")
      == Seq("produced 0 records to Out"))

    // inventory commands
    assert(capture("ls", lake) == Seq("Raw", "Staging"))
    assert(capture("info", lake, "Staging") == Seq("commits: 1", "rows: 4"))
    assert(capture("topic-info", bus, "T") == Seq("low 0 high 3"))
  }

  test("from-kafka routes from a transform YAML with -exitafter polling") {
    val bus = Files.createTempDirectory("cli-yroute-bus").toString
    val lake = Files.createTempDirectory("cli-yroute-lake").toString
    val recs = Files.createTempFile("yrecs", ".zson")
    Files.write(recs, "{op:\"c\",n:1}\n{op:\"c\",n:2}\n".getBytes)
    val yaml = Files.createTempFile("yroute", ".yaml")
    Files.write(yaml,
      """inputs:
        |  - topic: T
        |    pool: Raw
        |output:
        |  topic: Out
        |  pool: Staging
        |transforms:
        |  - type: stateless
        |    where: value.op=="c"
        |    in: T
        |    out: Out
        |    zed: |
        |      | out:={ key: {n: in.value.n}, value: { n: in.value.n } }
        |""".stripMargin.getBytes)
    assert(capture("produce", bus, "T", recs.toString)
      == Seq("produced 2 records to T"))
    // pool+topics derived from the transform inputs; exitafter polls >= 1x
    assert(capture("from-kafka", bus, lake, yaml.toString, "-exitafter", "300")
      == Seq("synced 2 records into Raw"))
    assert(capture("info", lake, "Raw") == Seq("commits: 1", "rows: 2"))
  }

  test("from-kafka applies a SQL shaper in flight (README.md:77-80 parity)") {
    val bus = Files.createTempDirectory("cli-shaper-bus").toString
    val lake = Files.createTempDirectory("cli-shaper-lake").toString
    val recs = Files.createTempFile("srecs", ".zson")
    Files.write(recs, "{op:\"c\",n:7}\n".getBytes)
    assert(capture("produce", bus, "S", recs.toString)
      == Seq("produced 1 records to S"))
    capture("from-kafka", bus, lake, "Shaped", "S",
      """SELECT kafka, key,
                named_struct('op', upper(value.op), 'n', value.n * 10) AS value
         FROM this""")
    val out = capture("consume-pool", lake, "Shaped")
    assert(out == Seq("""{kafka:{topic:"S",partition:0,offset:0},value:{op:"C",n:70}}"""),
      out)
  }

  test("registry-avro produce/consume with a file-backed registry") {
    val bus = Files.createTempDirectory("cli-abus").toString
    val reg = Files.createTempDirectory("cli-reg").toString
    val recs = Files.createTempFile("arecs", ".zson")
    Files.write(recs,
      """{op:"c",n:1}
        |{op:"u",n:2}
        |""".stripMargin.getBytes)

    assert(capture("produce-avro", bus, reg, "A", recs.toString)
      == Seq("produced 2 records to A"))
    // consumer recovers the type from the wire-format schema id alone
    val lines = capture("consume-avro", bus, reg, "A")
    assert(lines == Seq(
      """{kafka:{topic:"A",partition:0,offset:0},value:{op:"c",n:1}}""",
      """{kafka:{topic:"A",partition:0,offset:1},value:{op:"u",n:2}}"""), lines)

    // output flags work on the avro path too
    val json = capture("consume-avro", bus, reg, "A", "-f", "json")
    assert(json.size == 2 && json.head.contains(""""op":"c""""), json)
    assert(capture("consume-avro", bus, reg, "A", "-offset", "1").size == 1)

    // zync ls parity: one subject, RecordNameStrategy naming, v1
    val ls = capture("schemas", reg)
    assert(ls.head.startsWith("subject namespace.zng_"), ls.head)
    assert(ls.contains("  id 1") && ls.contains("  version 1"), ls)
    // re-produce the same schema: registry dedups, no new version
    assert(capture("produce-avro", bus, reg, "A", recs.toString)
      == Seq("produced 2 records to A"))
    assert(capture("schemas", reg) == ls)
    // -namespace names new schemas under the given namespace
    assert(capture("produce-avro", bus, reg, "A", recs.toString,
      "-namespace", "io.example") == Seq("produced 2 records to A"))
    assert(capture("schemas", reg).exists(_.startsWith("subject io.example.zng_")))
  }
}
