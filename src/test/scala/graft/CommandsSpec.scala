package graft

import graft.streaming.{ConnectJsonCodec, MemoryBus, RawStringCodec}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** End-to-end through the command facade: produce a JSON file to a topic,
  * sync it into a pool, ETL it, sync the output back to a topic, consume as
  * ZSON — the full zync workflow without a broker.
  */
class CommandsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = GraftSession.local(4)

  test("produce -> from-kafka -> etl -> to-kafka -> consume round trip") {
    val bus = new MemoryBus
    val root = Files.createTempDirectory("cmd").toString
    val file = Files.createTempFile("recs", ".json")
    Files.write(file, Seq(
      """{"op":"c","n":1}""",
      """{"op":"c","n":2}""",
      """{"op":"x","n":3}""").mkString("\n").getBytes)

    val valueSchema = StructType(Seq(
      StructField("op", StringType), StructField("n", LongType)))
    val vCodec = new ConnectJsonCodec(valueSchema)

    // produce file -> topic T
    val produced = Commands.produce(spark, bus, "T", file.toString,
      RawStringCodec, vCodec, valueExpr = "struct(op, n)")
    assert(produced == Map("T" -> 3))

    // from-kafka T -> pool Raw
    val synced = Commands.fromKafka(spark, bus, root,
      Map("Raw" -> Seq("T")), RawStringCodec, vCodec)
    assert(synced == Map("Raw" -> 3))
    assert(Commands.ls(root) == Seq("Raw"))

    // etl Raw -> Staging (keep op=="c", reshape)
    val yaml =
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
        |""".stripMargin
    val n = Commands.etl(spark, root, yaml)
    assert(n == 4) // 2 data + 2 done
    assert(Commands.ls(root) == Seq("Raw", "Staging"))
    assert(Commands.info(spark, root, "Staging") == Map("rows" -> 4L, "commits" -> 1L))

    // the compiled plan dump (zync etl -zed equivalent) mentions the
    // anti-join scaffold
    val plan = Commands.etlPlan(spark, root, yaml)
    assert(plan.contains("Join LeftAnti") || plan.contains("LeftAnti"))

    // to-kafka Staging/Out -> topic Out
    val outSchema = StructType(Seq(StructField("doubled", LongType)))
    val keySchema = StructType(Seq(StructField("n", LongType)))
    val sent = Commands.toKafka(spark, bus, root, "Staging", "Out",
      new ConnectJsonCodec(keySchema), new ConnectJsonCodec(outSchema))
    assert(sent == 2)

    // consume back as ZSON
    val lines = Commands.consume(spark, bus, "Out",
      new ConnectJsonCodec(keySchema), new ConnectJsonCodec(outSchema))
    assert(lines.toSeq == Seq(
      """{kafka:{topic:"Out",partition:0,offset:0},key:{n:1},value:{doubled:2}}""",
      """{kafka:{topic:"Out",partition:0,offset:1},key:{n:2},value:{doubled:4}}"""))

    // idempotency at the command level
    assert(Commands.etl(spark, root, yaml) == 0)
    assert(Commands.toKafka(spark, bus, root, "Staging", "Out",
      new ConnectJsonCodec(keySchema), new ConnectJsonCodec(outSchema)) == 0)
  }

  test("produce accepts ZSON input files (zync produce parity)") {
    val bus = new MemoryBus
    val file = Files.createTempFile("recs", ".zson")
    Files.write(file,
      """// two records
        |{op:"c",n:1}
        |{op:"u",n:2}
        |""".stripMargin.getBytes)
    val valueSchema = StructType(Seq(
      StructField("op", StringType), StructField("n", LongType)))
    val produced = Commands.produce(spark, bus, "Z", file.toString,
      RawStringCodec, new ConnectJsonCodec(valueSchema),
      valueExpr = "struct(op, n)")
    assert(produced == Map("Z" -> 2))
    val lines = Commands.consume(spark, bus, "Z",
      RawStringCodec, new ConnectJsonCodec(valueSchema))
    assert(lines.toSeq.map(_.contains("op:\"c\"")).head)
  }

  test("info on a created-but-never-appended pool reports zeros") {
    val root = Files.createTempDirectory("cmd-empty").toString
    graft.lake.Pool.create(spark, root, "Fresh")
    assert(Commands.info(spark, root, "Fresh") == Map("rows" -> 0L, "commits" -> 0L))
  }
}
