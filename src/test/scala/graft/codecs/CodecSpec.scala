package graft.codecs

import graft.GraftSession
import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Codec fidelity tests mirroring the reference's three tiers:
  * golden Avro schema JSON (zavro/schema_test.go — byte-exact Java field
  * order so a registry dedups against zync), Connect-JSON round-trips incl.
  * a Debezium envelope (connectjson/connectjson_test.go), and registry-Avro
  * wire round-trips through DataFrames.
  */
class CodecSpec extends AnyFunSuite {

  lazy val spark: SparkSession = GraftSession.local(4)

  // ---- golden: zavro/schema_test.go:12-57 (exact string incl. order) ----
  test("avro schema JSON field order matches Java (golden)") {
    // {a:{b:{}}}
    val typ = StructType(Seq(StructField("a",
      StructType(Seq(StructField("b", StructType(Seq())))))))
    val expected =
      """{
        |    "type": "record",
        |    "name": "zng_228c5f7a92fa77715f4dabe46739bfa3",
        |    "namespace": "namespace",
        |    "doc": "Created by zync from zng type {a:{b:{}}}",
        |    "fields": [
        |        {
        |            "name": "a",
        |            "type": [
        |                "null",
        |                {
        |                    "type": "record",
        |                    "name": "zng_eeb636be88d6a4d3387b3820995db8e7",
        |                    "namespace": "namespace",
        |                    "doc": "Created by zync from zng type {b:{}}",
        |                    "fields": [
        |                        {
        |                            "name": "b",
        |                            "type": [
        |                                "null",
        |                                {
        |                                    "type": "record",
        |                                    "name": "zng_99914b932bd37a50b983c5e7c90ae93b",
        |                                    "namespace": "namespace",
        |                                    "doc": "Created by zync from zng type {}",
        |                                    "fields": null
        |                                }
        |                            ],
        |                            "default": null
        |                        }
        |                    ]
        |                }
        |            ],
        |            "default": null
        |        }
        |    ]
        |}""".stripMargin
    assert(ZAvro.registryJson(typ, "namespace") == expected)
  }

  test("null-typed record field becomes bare null, not a union (golden)") {
    // {a:null}
    val typ = StructType(Seq(StructField("a", NullType)))
    val json = ZAvro.registryJson(typ, "namespace")
    assert(json.contains(""""name": "zng_4f5c13d8a692b16d2a7d297f951880a3""""))
    assert(json.contains("\"type\": \"null\"") || json.contains("\"type\": \"null\","))
    assert(!json.contains("[\n            \"null\",\n            \"null\""))
  }

  test("repeated record type becomes a named reference (golden)") {
    // {a:{},b:{}}
    val typ = StructType(Seq(
      StructField("a", StructType(Seq())), StructField("b", StructType(Seq()))))
    val json = ZAvro.registryJson(typ, "namespace")
    assert(json.contains(""""name": "zng_2d7e63a29282715120ae93531a98c9ef""""))
    // second occurrence is the bare name string, not a nested record object
    assert(json.contains("\"zng_99914b932bd37a50b983c5e7c90ae93b\"\n            ]"))
    assert(json.indexOf("\"type\": \"record\"") == json.lastIndexOf("\"type\": \"record\"")
      || json.split("zng_99914b932bd37a50b983c5e7c90ae93b").length == 3)
  }

  // ---- registry-Avro wire round-trip through DataFrames ------------------
  test("registry-avro encode/decode round-trips a DataFrame") {
    val st = StructType(Seq(
      StructField("id", LongType), StructField("name", StringType),
      StructField("score", DoubleType), StructField("ok", BooleanType),
      StructField("blob", BinaryType),
      StructField("nested", StructType(Seq(
        StructField("x", IntegerType), StructField("tags", ArrayType(StringType)))))))
    val rows = Seq(
      Row(1L, "alice", 9.5, true, Array[Byte](1, 2, 3), Row(7, Seq("a", "b"))),
      Row(2L, "bob", -0.25, false, null, Row(null, Seq())),
      Row(3L, null, null, null, null, null))
    val df = spark.createDataFrame(spark.sparkContext.parallelize(rows), st)

    val registry = new InMemorySchemaRegistry
    val encoded = df.select(
      ZAvro.encodeColumn(struct(df.columns.map(col): _*), st, "ns", registry).as("msg"))
    val decoded = encoded.select(ZAvro.decodeColumn(col("msg"), st, registry).as("v"))
      .select("v.*")

    def canon(r: Row): String = r.toSeq.map {
      case b: Array[Byte] => b.map(x => f"$x%02x").mkString
      case other => String.valueOf(other)
    }.mkString("|")
    val got = decoded.collect().map(canon).sorted.toSeq
    val want = df.collect().map(canon).sorted.toSeq
    assert(got == want)
  }

  test("wire frame: magic + big-endian schema id") {
    val framed = ZAvro.frame(0x01020304, Array[Byte](9, 9))
    assert(framed.take(5).toSeq == Seq[Byte](0, 1, 2, 3, 4))
    val (id, body) = ZAvro.unframe(framed)
    assert(id == 0x01020304 && body.toSeq == Seq[Byte](9, 9))
    assertThrows[IllegalArgumentException](ZAvro.unframe(Array[Byte](1, 0, 0, 0, 1)))
  }

  test("registry dedups identical schemas by content") {
    val r = new InMemorySchemaRegistry
    val a = r.createSchema("s", "{\"x\":1}")
    val b = r.createSchema("s", "{\"x\":1}")
    val c = r.createSchema("s", "{\"x\":2}")
    assert(a == b && a != c)
    assert(r.getSchema(a) == "{\"x\":1}")
  }

  // ---- Connect-JSON -------------------------------------------------------
  test("connect-json schema translation round-trips") {
    val st = StructType(Seq(
      StructField("op", StringType),
      StructField("n", LongType),
      StructField("frac", DoubleType),
      StructField("flag", BooleanType),
      StructField("raw", BinaryType),
      StructField("before", StructType(Seq(
        StructField("ID", LongType), StructField("name", StringType))))))
    val json = ConnectJson.schemaJson(st)
    assert(json.startsWith("""{"type":"struct","optional":true,"fields":["""))
    assert(ConnectJson.schemaToSpark(json) == st)
  }

  test("connect-json round-trips a Debezium-style envelope") {
    // the shape of connectjson_test.go:31's Debezium MySQL event
    val rec = StructType(Seq(
      StructField("ID", LongType), StructField("customer", StringType),
      StructField("item", StringType)))
    val st = StructType(Seq(
      StructField("op", StringType),
      StructField("ts_ms", LongType),
      StructField("before", rec),
      StructField("after", rec)))
    val rows = Seq(
      Row("u", 1670000000123L, Row(1L, "Alice", "taco"), Row(1L, "Alice", "burrito")),
      Row("c", 1670000000456L, null, Row(2L, "Bob", "beans")))
    val df = spark.createDataFrame(spark.sparkContext.parallelize(rows), st)

    val enc = df.select(ConnectJson.encode(struct(df.columns.map(col): _*), st).as("msg"))
    val sample = enc.head().getString(0)
    assert(sample.startsWith("""{"schema":{"type":"struct","optional":true"""))
    // schema survives the trip
    assert(ConnectJson.sniffSchema(sample) == st)
    // payload survives the trip (shaped back by declared schema)
    val dec = enc.select(ConnectJson.decode(col("msg"), st).as("v")).select("v.*")
    assert(dec.collect().map(_.toString).sorted.toSeq ==
      df.collect().map(_.toString).sorted.toSeq)
  }

  test("connect-json timestamps travel as int64 ns and round-trip") {
    // Reference encodes Zed time as int64 nanoseconds (connectjson.go:119);
    // the schema declares "int64", so the payload must be numeric — an
    // ISO-8601 string there would be self-inconsistent on the wire.
    val st = StructType(Seq(
      StructField("id", LongType),
      StructField("ts", TimestampType),
      StructField("nested", StructType(Seq(StructField("seen", TimestampType))))))
    val t1 = java.sql.Timestamp.from(java.time.Instant.parse("2023-12-03T10:15:30.123456Z"))
    val t2 = java.sql.Timestamp.from(java.time.Instant.parse("1970-01-02T00:00:00Z"))
    val rows = Seq(Row(1L, t1, Row(t2)), Row(2L, null, null))
    val df = spark.createDataFrame(spark.sparkContext.parallelize(rows), st)

    val enc = df.select(ConnectJson.encode(struct(df.columns.map(col): _*), st).as("msg"))
    val sample = enc.orderBy(get_json_object(col("msg"), "$.payload.id")).head().getString(0)
    val expectedNs =
      t1.toInstant.getEpochSecond * 1000000000L + t1.toInstant.getNano
    assert(sample.contains(s""""ts":$expectedNs"""), sample)
    assert(!sample.contains("2023-12-03"), sample) // no ISO strings on the wire

    val dec = enc.select(ConnectJson.decode(col("msg"), st).as("v")).select("v.*")
    assert(dec.collect().map(_.toString).sorted.toSeq ==
      df.collect().map(_.toString).sorted.toSeq)
  }

  test("tagged structs encode back to avro general unions (round trip)") {
    // encode direction for the union stand-in — the reference is
    // decode-only (zavro/schema.go:234-244); this closes the loop
    val unionT = StructType(Seq(
      StructField("tag", IntegerType),
      StructField("u0", StringType), StructField("u1", LongType)))
    val st = StructType(Seq(StructField("id", LongType), StructField("v", unionT)))
    assert(ZAvro.zsonType(st) == "{id:int64,v:(string,int64)}")

    val avro = ZAvro.avroSchema(st, "ns")
    val vField = avro.getField("v").schema()
    assert(vField.getType == org.apache.avro.Schema.Type.UNION)
    assert(vField.getTypes.size() == 2) // [string, long] — no null nesting

    val rows = Seq(Row(1L, Row(0, "hello", null)), Row(2L, Row(1, null, 42L)))
    val df = spark.createDataFrame(spark.sparkContext.parallelize(rows), st)
    val reg = new InMemorySchemaRegistry
    val enc = df.select(
      ZAvro.encodeColumn(struct(col("id"), col("v")), st, "ns", reg).as("msg"))
    val back = enc.select(ZAvro.decodeColumn(col("msg"), st, reg).as("r"))
      .select("r.*").orderBy("id").collect()
    assert(back(0) == Row(1L, Row(0, "hello", null)))
    assert(back(1) == Row(2L, Row(1, null, 42L)))
  }

  test("general avro unions decode to tagged structs; timestamps to micros") {
    import org.apache.avro.{Schema => AS, SchemaBuilder}
    import org.apache.avro.generic.GenericData
    // {id: long, v: union[string, long], ts: timestamp-micros}
    val union = AS.createUnion(AS.create(AS.Type.STRING), AS.create(AS.Type.LONG))
    val ts = org.apache.avro.LogicalTypes.timestampMicros()
      .addToSchema(AS.create(AS.Type.LONG))
    val rec = AS.createRecord("r", null, "ns", false)
    rec.setFields(java.util.List.of(
      new AS.Field("id", AS.create(AS.Type.LONG), null, null),
      new AS.Field("v", union, null, null),
      new AS.Field("ts", ts, null, null)))

    val target = ZAvro.avroToSpark(rec).asInstanceOf[StructType]
    assert(target("v").dataType == StructType(Seq(
      StructField("tag", IntegerType), StructField("u0", StringType),
      StructField("u1", LongType))))
    assert(target("ts").dataType == TimestampType)

    def enc(id: Long, v: AnyRef, micros: Long): Array[Byte] = {
      val r = new GenericData.Record(rec)
      r.put("id", Long.box(id)); r.put("v", v); r.put("ts", Long.box(micros))
      val out = new java.io.ByteArrayOutputStream()
      val e = org.apache.avro.io.EncoderFactory.get().binaryEncoder(out, null)
      new org.apache.avro.generic.GenericDatumWriter[GenericData.Record](rec).write(r, e)
      e.flush(); out.toByteArray
    }
    val t0 = 1700000000123456L
    val msgs = Seq(
      ZAvro.frame(1, enc(1, "hello", t0)),
      ZAvro.frame(1, enc(2, Long.box(42L), t0 + 1)))
    val reg = new InMemorySchemaRegistry
    // seed the registry so id 1 resolves to this schema
    assert(reg.createSchema("s", rec.toString) == 1)

    import spark.implicits._
    val df = msgs.toDF("msg")
    val got = df.select(ZAvro.decodeColumn(col("msg"), target, reg).as("v"))
      .select("v.*").orderBy("id").collect()
    assert(got(0).getAs[Row]("v") == Row(0, "hello", null))
    assert(got(1).getAs[Row]("v") == Row(1, null, 42L))
    val inst = got(0).getAs[java.sql.Timestamp]("ts").toInstant
    assert(inst == java.time.Instant.ofEpochSecond(t0 / 1000000, (t0 % 1000000) * 1000))
  }

  test("connect-json decode shapes/reorders inferred payloads (ref :214-226)") {
    import spark.implicits._
    val declared = StructType(Seq(
      StructField("b", LongType), StructField("a", StringType)))
    val msgs = Seq("""{"schema":{},"payload":{"a":"x","b":"42"}}""").toDF("m")
    val out = msgs.select(ConnectJson.decode(col("m"), declared).as("v")).select("v.*")
    // field order follows the declared schema; "42" cast-shaped to long
    assert(out.schema == declared)
    assert(out.head() == Row(42L, "x"))
  }
}
