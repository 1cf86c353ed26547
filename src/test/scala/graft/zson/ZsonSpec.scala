package graft.zson

import graft.GraftSession
import graft.codecs.ZAvro
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

class ZsonSpec extends AnyFunSuite {

  lazy val spark = GraftSession.local(4)

  test("parses the reference's done/cursor/envelope types") {
    // etl/pipeline.go:29
    val done = ZsonType.parse("{kafka:{topic:string,offset:int64}}(=done)")
    assert(done.name.contains("done"))
    assert(done.dataType == StructType(Seq(
      StructField("kafka", StructType(Seq(
        StructField("topic", StringType), StructField("offset", LongType)))))))
    // design.md cursor
    assert(ZsonType.parse("{seqno:int64}(=cursor)").name.contains("cursor"))
    // fifo/consumer.go:54
    assert(ZsonType.toSpark("{topic:string,partition:int64,offset:int64}") ==
      StructType(Seq(StructField("topic", StringType),
        StructField("partition", LongType), StructField("offset", LongType))))
    assert(ZsonType.toSpark("[{a:int32,b:[float64]}]") ==
      ArrayType(StructType(Seq(StructField("a", IntegerType),
        StructField("b", ArrayType(DoubleType))))))
  }

  test("round-trips with ZAvro.zsonType for the mappable subset") {
    val types: Seq[DataType] = Seq(
      StructType(Seq(StructField("a", LongType), StructField("b", StringType))),
      StructType(Seq(StructField("x", StructType(Seq(
        StructField("y", ArrayType(DoubleType)), StructField("z", BooleanType)))))),
      StructType(Seq(StructField("t", TimestampType), StructField("raw", BinaryType))))
    types.foreach { t =>
      assert(ZsonType.toSpark(ZAvro.zsonType(t)) == t, ZAvro.zsonType(t))
    }
  }

  test("rejects malformed input") {
    assertThrows[IllegalArgumentException](ZsonType.parse("{a:int64"))
    assertThrows[IllegalArgumentException](ZsonType.parse("{a:frob}"))
    assertThrows[IllegalArgumentException](ZsonType.parse("{a:int64}trailing"))
  }

  // ------------------------------------------------------ value reader

  test("reads the reference demo batch fixtures (demo/batch-1.zson)") {
    val path = "/root/reference/demo/batch-1.zson"
    assume(java.nio.file.Files.exists(java.nio.file.Paths.get(path)))
    val df = ZsonValue.read(spark, path)
    // batch-1: 4 Invoices rows + 2 InvoiceStatus rows (file comments list
    // 4 status seeds but the values section carries offsets 1-2 per topic)
    assert(df.columns.toSeq == Seq("kafka", "key", "value"))
    val invoices = df.filter(col("kafka.topic") === "Invoices")
    val byOffset = invoices.orderBy("kafka.offset").collect()
    assert(byOffset.head.getAs[org.apache.spark.sql.Row]("value")
      .getAs[org.apache.spark.sql.Row]("after")
      .getAs[String]("customer") == "Alice")
    // fused schema: Invoices carries customer/item, InvoiceStatus carries
    // InvoiceID/status — one wide `after` struct
    val after = df.schema("value").dataType.asInstanceOf[StructType]("after")
      .dataType.asInstanceOf[StructType].fieldNames.toSet
    assert(Set("customer", "item").subsetOf(after) ||
      Set("InvoiceID", "status").subsetOf(after))
  }

  test("named decorations become the _type marker (demo/staging-1.zson shape)") {
    val text =
      """{seqno:3,kafka:{topic:"order",offset:1},row:{qty:2,total:3.98}}
        |{seqno:2}(=cursor)
        |""".stripMargin
    val df = ZsonValue.toDataFrame(spark, text)
    assert(df.columns.contains("_type"))
    assert(df.filter(col("_type") === "cursor").select("seqno")
      .head().getLong(0) == 2L)
    val data = df.filter(col("_type").isNull)
    assert(data.select("row.total").head().getDouble(0) == 3.98)
  }

  test("value reader round-trips Zson rendering") {
    val text =
      """{a:1,s:"x\ny",t:2023-12-03T10:15:30.123456Z,arr:[1,2,3],f:2.5,ok:true,raw:0xdeadbeef}
        |{a:2,missing:"later"}
        |""".stripMargin
    val df = ZsonValue.toDataFrame(spark, text)
    val rendered = Zson.renderAll(df.orderBy("a")).toSeq
    assert(rendered.head ==
      """{a:1,s:"x\ny",t:2023-12-03T10:15:30.123456Z,arr:[1,2,3],f:2.5,ok:true,raw:0xdeadbeef}""",
      rendered.head)
    // re-parse what we rendered: fixpoint
    val again = ZsonValue.toDataFrame(spark, rendered.mkString("\n"))
    assert(Zson.renderAll(again.orderBy("a")).toSeq == rendered)
  }

  test("render -> parse fixpoint on generated nested values") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    def samples[A](g: Gen[A], n: Int): Seq[A] =
      (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(7L + i)))

    val genStr = Gen.listOf(Gen.oneOf('a', 'Z', '"', '\\', '\n', '\t', 'é',
      '中', ' ', '{', ']', ':')).map(_.mkString)
    val genRow: Gen[org.apache.spark.sql.Row] = for {
      s <- Gen.option(genStr)
      l <- Gen.chooseNum(Long.MinValue + 1, Long.MaxValue)
      d <- Gen.oneOf(Gen.chooseNum(-1e12, 1e12), Gen.const(0.25), Gen.const(3.0))
      b <- Gen.oneOf(true, false)
      arr <- Gen.listOfN(3, Gen.chooseNum(-100L, 100L))
      nested <- Gen.option(genStr.map(x => org.apache.spark.sql.Row(x)))
    } yield org.apache.spark.sql.Row(s.orNull, l, d, b, arr, nested.orNull)
    val schema = StructType(Seq(
      StructField("s", StringType), StructField("l", LongType),
      StructField("d", DoubleType), StructField("b", BooleanType),
      StructField("arr", ArrayType(LongType)),
      StructField("nested", StructType(Seq(StructField("x", StringType))))))

    val rows = samples(genRow, 60)
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows), schema).withColumn("id",
      org.apache.spark.sql.functions.monotonically_increasing_id())
    val rendered = Zson.renderAll(df.orderBy("l", "s")).toSeq
    // the rendered text parses back, and re-rendering is a fixpoint
    val again = ZsonValue.toDataFrame(spark, rendered.mkString("\n"))
    assert(Zson.renderAll(again.orderBy("l", "s")).toSeq == rendered)
  }

  test("value reader rejects garbage") {
    assertThrows[IllegalArgumentException](ZsonValue.parseAll("{a:frob}"))
    assertThrows[IllegalArgumentException](
      ZsonValue.toDataFrame(spark, """[1,2]"""))
  }

  // ------------------------------------------- exotic literals (round 5)

  test("maps-as-values: |{...}| parses to MapType and renders back") {
    val text = """{id:1,attrs:|{"color":"red","size":"xl"}|}
                 |{id:2,attrs:|{"color":"blue"}|}""".stripMargin
    val df = ZsonValue.toDataFrame(spark, text)
    assert(df.schema("attrs").dataType ==
      MapType(StringType, StringType))
    val m = df.orderBy("id").collect()(0).getAs[Map[String, String]]("attrs")
    assert(m == Map("color" -> "red", "size" -> "xl"))
    val rendered = Zson.renderAll(df.orderBy("id")).toSeq
    assert(rendered == Seq(
      """{id:1,attrs:|{"color":"red","size":"xl"}|}""",
      """{id:2,attrs:|{"color":"blue"}|}"""))
  }

  test("type values: <t> parses to the tagged struct and renders back") {
    val text = "{id:1,kind:<int64>}\n{id:2,kind:<{a:string,b:[float64]}>}"
    val df = ZsonValue.toDataFrame(spark, text)
    val rendered = Zson.renderAll(df.orderBy("id")).toSeq
    assert(rendered == Seq(
      "{id:1,kind:<int64>}",
      "{id:2,kind:<{a:string,b:[float64]}>}"))
  }

  test("union casts: v((t1,t2)) become tagged structs and render back") {
    val text = """{id:1,val:1((int64,string))}
                 |{id:2,val:"two"((int64,string))}""".stripMargin
    val df = ZsonValue.toDataFrame(spark, text)
    val vt = df.schema("val").dataType.asInstanceOf[StructType]
    assert(vt.fieldNames.toSeq == Seq("_utag", "_u0", "_u1"))
    assert(vt("_u0").dataType == LongType && vt("_u1").dataType == StringType)
    val rows = df.orderBy("id").collect()
    assert(rows(0).getAs[org.apache.spark.sql.Row]("val").getInt(0) == 0)
    assert(rows(1).getAs[org.apache.spark.sql.Row]("val").getString(2) == "two")
    assert(Zson.renderAll(df.orderBy("id")).toSeq == Seq(
      """{id:1,val:1((int64,string))}""",
      """{id:2,val:"two"((int64,string))}"""))
  }

  test("null map values and null array elements survive the round trip") {
    val text = """{id:1,attrs:|{"k":null,"c":"red"}|,xs:[1,null,3]}"""
    val df = ZsonValue.toDataFrame(spark, text)
    val m = df.collect()(0).getAs[Map[String, String]]("attrs")
    assert(m == Map("k" -> null, "c" -> "red"), "entry kept with null value")
    assert(Zson.renderAll(df).toSeq ==
      Seq("""{id:1,attrs:|{"c":"red","k":null}|,xs:[1,null,3]}"""))
  }

  test("union tag selection prefers the exact-type branch over widening") {
    // first-compatible would tag 1 as float64 and re-render 1. — not
    // value-preserving; the exact int64 branch must win regardless of order
    val df = ZsonValue.toDataFrame(spark,
      """{id:1,v:1((float64,int64))}
        |{id:2,v:1.5((float64,int64))}""".stripMargin)
    val rows = df.orderBy("id").collect()
    assert(rows(0).getAs[org.apache.spark.sql.Row]("v").getInt(0) == 1, "int64 branch")
    assert(rows(1).getAs[org.apache.spark.sql.Row]("v").getInt(0) == 0, "float64 branch")
    assert(Zson.renderAll(df.orderBy("id")).toSeq == Seq(
      """{id:1,v:1((float64,int64))}""",
      """{id:2,v:1.5((float64,int64))}"""))
  }

  test("null unions parse (tag-less) and render back as null((t1,t2))") {
    val df = ZsonValue.toDataFrame(spark,
      """{id:1,v:null((int64,string))}
        |{id:2,v:"s"((int64,string))}""".stripMargin)
    val rows = df.orderBy("id").collect()
    assert(rows(0).getAs[org.apache.spark.sql.Row]("v").isNullAt(0), "null _utag")
    assert(Zson.renderAll(df.orderBy("id")).toSeq == Seq(
      """{id:1,v:null((int64,string))}""",
      """{id:2,v:"s"((int64,string))}"""))
  }

  test("sets |[...]| parse as arrays (set-ness dropped, like the reference's Avro)") {
    val df = ZsonValue.toDataFrame(spark, "{id:1,tags:|[\"a\",\"b\"]|}")
    assert(df.schema("tags").dataType == ArrayType(StringType))
    assert(Zson.renderAll(df).toSeq == Seq("""{id:1,tags:["a","b"]}"""))
  }

  test("primitive cast decorations coerce scalars: 1(float64)") {
    val df = ZsonValue.toDataFrame(spark, "{id:1,x:2(float64)}")
    assert(df.schema("x").dataType == DoubleType)
    assert(Zson.renderAll(df).toSeq == Seq("{id:1,x:2.}"))
  }

  test("exotic literals round-trip produce -> pool -> consume") {
    val text =
      """{kafka:{topic:"T",offset:0},attrs:|{"k":"v"}|,kind:<int64>,u:7((int64,string))}
        |{kafka:{topic:"T",offset:1},attrs:|{"a":"b","c":"d"}|,kind:<bytes>,u:"s"((int64,string))}(=thing)""".stripMargin
    // produce: parse to a DataFrame and commit to a pool
    val df = ZsonValue.toDataFrame(spark, text)
    val root = java.nio.file.Files.createTempDirectory("zson-exotic").toString
    val pool = graft.lake.Pool.create(spark, root, "Z")
    pool.append(df)
    // consume: read the pool back and render as ZSON
    val back = pool.read().orderBy("kafka.offset")
    val rendered = Zson.renderAll(back).toSeq
    assert(rendered == text.linesIterator.toSeq,
      s"round trip diverged:\n${rendered.mkString("\n")}")
  }
}
