package graft.zson

import graft.GraftSession
import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** ZNG binary format: writer↔reader round trips over the ZSON fixture
  * subset, golden wire bytes (so any drift from the documented frame/
  * typedef/value layout is visible in review), multi-frame streams,
  * type-context reset at EOS, and LZ4-compressed value frames.
  */
class ZngSpec extends AnyFunSuite {

  lazy val spark: SparkSession = GraftSession.local(4)

  private def tmp(name: String): String =
    Files.createTempDirectory("zng").resolve(name).toString

  test("property: random nested rows survive the binary round trip") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    def samples[A](g: Gen[A], n: Int): Seq[A] =
      (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(1042L + i)))

    val schema = StructType(Seq(
      StructField("s", StringType), StructField("l", LongType),
      StructField("d", DoubleType), StructField("b", BooleanType),
      StructField("raw", BinaryType), StructField("ts", TimestampType),
      StructField("nested", StructType(Seq(
        StructField("x", LongType), StructField("tags", ArrayType(StringType)))))))

    val genStr: Gen[String] = Gen.oneOf(
      Gen.alphaNumStr,
      Gen.listOf(Gen.oneOf('a', '"', '\\', '\n', '\t', 'e', ' ', '{', '[')).map(_.mkString))
    val genRow: Gen[Row] = for {
      str <- Gen.option(genStr)
      l <- Gen.option(Gen.chooseNum(Long.MinValue + 1, Long.MaxValue))
      d <- Gen.option(Gen.oneOf(Gen.chooseNum(-1e12, 1e12), Gen.const(0.25)))
      b <- Gen.option(Gen.oneOf(true, false))
      raw <- Gen.option(Gen.listOf(Gen.chooseNum(-128, 127).map(_.toByte)).map(_.toArray))
      us <- Gen.option(Gen.chooseNum(-4000000000000000L, 4000000000000000L))
      x <- Gen.option(Gen.chooseNum(Long.MinValue + 1, Long.MaxValue))
      tags <- Gen.option(Gen.nonEmptyListOf(genStr))
      nestedNull <- Gen.prob(0.2)
    } yield Row(str.orNull, l.map(Long.box).orNull, d.map(Double.box).orNull,
      b.map(Boolean.box).orNull, raw.orNull,
      us.map(u => java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(
        Math.floorDiv(u, 1000000L), Math.floorMod(u, 1000000L) * 1000L))).orNull,
      if (nestedNull) null else Row(x.map(Long.box).orNull, tags.map(_.toSeq).orNull))

    def canon(r: Row): String = {
      def v(a: Any): String = a match {
        case null => "N"
        case bytes: Array[Byte] => bytes.map(y => f"$y%02x").mkString
        case row: Row => row.toSeq.map(v).mkString("(", ",", ")")
        case seq: scala.collection.Seq[_] => seq.map(v).mkString("[", ",", "]")
        case t: java.sql.Timestamp => t.toInstant.toString
        case other => String.valueOf(other)
      }
      r.toSeq.map(v).mkString("|")
    }

    samples(Gen.listOfN(20, genRow), 6).zipWithIndex.foreach { case (rows, i) =>
      val df = spark.createDataFrame(spark.sparkContext.parallelize(rows, 2), schema)
      val path = tmp(s"prop$i.zng")
      Zng.write(df, path)
      val got = Zng.read(spark, path).collect().map(canon).sorted.toSeq
      val want = df.collect().map(canon).sorted.toSeq
      assert(got == want, s"sample $i diverged")
    }
  }

  test("round trip: nested records, arrays, scalars, nulls, _type marker") {
    val schema = StructType(Seq(
      StructField("s", StringType),
      StructField("n", LongType),
      StructField("f", DoubleType),
      StructField("b", BooleanType),
      StructField("bin", BinaryType),
      StructField("ts", TimestampType),
      StructField("rec", StructType(Seq(
        StructField("x", LongType), StructField("y", StringType)))),
      StructField("arr", ArrayType(LongType)),
      StructField("_type", StringType)))
    val rows = Seq(
      Row("hi", 7L, 2.5, true, Array[Byte](1, 2), java.sql.Timestamp.from(
        java.time.Instant.parse("2024-03-01T10:00:00.123456Z")),
        Row(1L, "a"), Seq(1L, 2L, 3L), "thing"),
      Row(null, -42L, -0.125, false, null, null, Row(null, "b"), Seq(), null),
      Row("third", 0L, 0.0, false, Array[Byte](), java.sql.Timestamp.from(
        java.time.Instant.parse("1969-12-31T23:59:59.5Z")),
        null, null, "thing"))
    val df = spark.createDataFrame(spark.sparkContext.parallelize(rows, 2), schema)
      .orderBy("n")

    val path = tmp("rt.zng")
    Zng.write(df, path)
    val back = Zng.read(spark, path)

    // ZSON text is the canonical comparison surface for both readers
    val got = Zson.renderAll(back.orderBy("n")).toSeq
    val want = Zson.renderAll(df.orderBy("n")).toSeq
    assert(got == want)
  }

  test("golden wire bytes for one record (pins the documented layout)") {
    val schema = StructType(Seq(StructField("a", LongType), StructField("s", StringType)))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(Row(1L, "hi")), 1), schema)
    val path = tmp("golden.zng")
    Zng.write(df, path)
    val bytes = Files.readAllBytes(java.nio.file.Paths.get(path)).map(_ & 0xff)

    val expected = Seq(
      0x08, 0x00,             // types frame, length 8
      0x00, 0x02,             //   typedef 0 = record, 2 fields
      0x01, 'a'.toInt, 0x09,  //   "a" int64 (id 9)
      0x01, 's'.toInt, 0x19,  //   "s" string (id 25)
      0x17, 0x00,             // values frame, length 7
      0x1e,                   //   type id 30 (first typedef)
      0x06,                   //   record tag: body 5 bytes
      0x02, 0x02,             //     a: tag 2 (1 byte), zigzag(1)=2
      0x03, 'h'.toInt, 'i'.toInt, // s: tag 3 (2 bytes), "hi"
      0xff)                   // EOS
    assert(bytes.toSeq == expected)
  }

  test("empty stream (types + EOS, no values) reads back with its schema") {
    val schema = StructType(Seq(StructField("a", LongType), StructField("s", StringType)))
    val df = spark.createDataFrame(spark.sparkContext.emptyRDD[Row], schema)
    val path = tmp("empty.zng")
    Zng.write(df, path)
    val back = Zng.read(spark, path)
    assert(back.count() == 0)
    assert(back.schema.fieldNames.toSeq == Seq("a", "s"))
  }

  test("empty stream with NESTED structs keeps the OUTER record schema") {
    // inner typedefs are written before the outer record; the reader must
    // pick the DAG root, not the first record typedef
    val schema = StructType(Seq(
      StructField("kafka", StructType(Seq(
        StructField("topic", StringType), StructField("offset", LongType)))),
      StructField("value", StructType(Seq(StructField("n", LongType))))))
    val df = spark.createDataFrame(spark.sparkContext.emptyRDD[Row], schema)
    val path = tmp("empty-nested.zng")
    Zng.write(df, path)
    val back = Zng.read(spark, path)
    assert(back.count() == 0)
    assert(back.schema.fieldNames.toSeq == Seq("kafka", "value"))
    assert(back.schema("kafka").dataType.asInstanceOf[StructType]
      .fieldNames.toSeq == Seq("topic", "offset"))
  }

  test("timestamp_ntz columns encode as ZNG time") {
    val schema = StructType(Seq(StructField("t", TimestampNTZType)))
    val df = spark.createDataFrame(spark.sparkContext.parallelize(Seq(
      Row(java.time.LocalDateTime.parse("2024-05-01T12:30:00")))), schema)
    val path = tmp("ntz.zng")
    Zng.write(df, path)
    val back = Zng.read(spark, path).collect()
    assert(back.length == 1)
    assert(back(0).getTimestamp(0).toInstant ==
      java.time.Instant.parse("2024-05-01T12:30:00Z"))
  }

  test("uint64 beyond int64 range fails loudly instead of wrapping") {
    // types frame: record {u: uint64(id 3)}; value 2^63 as uvarint
    val types = Array[Byte](0x05, 0x00, 0x00, 0x01, 0x01, 'u'.toByte, 0x03)
    val big = Array[Byte](0x80.toByte, 0x80.toByte, 0x80.toByte, 0x80.toByte,
      0x80.toByte, 0x80.toByte, 0x80.toByte, 0x80.toByte, 0x80.toByte, 0x01)
    val body = Array[Byte]((big.length + 1).toByte) ++ big
    val values = Array[Byte](0x1e, (body.length + 1).toByte) ++ body
    val vhdr = Array[Byte]((0x10 | (values.length & 0xf)).toByte,
      (values.length >> 4).toByte)
    val stream = types ++ vhdr ++ values :+ 0xff.toByte
    val e = intercept[IllegalArgumentException](Zng.parse(stream))
    assert(e.getMessage.contains("uint64"))
  }

  test("multiple streams: EOS resets the type context") {
    val schema = StructType(Seq(StructField("v", LongType)))
    def df(n: Long) = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(Row(n)), 1), schema)
    val p1 = tmp("s1.zng")
    val p2 = tmp("s2.zng")
    Zng.write(df(1), p1)
    Zng.write(df(2), p2)
    val cat = Files.readAllBytes(java.nio.file.Paths.get(p1)) ++
      Files.readAllBytes(java.nio.file.Paths.get(p2))
    val vals = Zng.parse(cat)
    assert(vals.map(v => Zson.render(
      ZsonValue.toDataFrame(spark, Seq(v)).collect()(0),
      StructType(Seq(StructField("v", LongType))))) == Seq("{v:1}", "{v:2}"))
  }

  test("reads LZ4-compressed value frames") {
    // hand-build a stream whose values frame is LZ4 block-compressed
    val typesFrame = Array[Byte](0x05, 0x00, 0x00, 0x01, 0x01, 'v'.toByte, 0x09)
    val valuesRaw = Array[Byte](0x1e, 0x03, 0x02, 0x54) // {v: zigzag 42}
    val comp = net.jpountz.lz4.LZ4Factory.fastestInstance().fastCompressor()
      .compress(valuesRaw)
    val payload = Array[Byte](0x00, valuesRaw.length.toByte) ++ comp // fmt 0, usize
    val hdr = Array[Byte]((0x40 | 0x10 | (payload.length & 0xf)).toByte,
      (payload.length >> 4).toByte)
    val stream = typesFrame ++ hdr ++ payload :+ 0xff.toByte
    val vals = Zng.parse(stream)
    assert(vals.size == 1)
    assert(vals.head.z == ZsonValue.ZRecord(Vector("v" -> ZsonValue.ZInt(42L))))
  }

  test("produce accepts .zng input") {
    val schema = StructType(Seq(StructField("op", StringType), StructField("n", LongType)))
    val df = spark.createDataFrame(spark.sparkContext.parallelize(Seq(
      Row("c", 10L), Row("u", 20L)), 1), schema)
    val path = tmp("produce.zng")
    Zng.write(df, path)

    val bus = new graft.streaming.MemoryBus
    val codec = new graft.streaming.ConnectJsonCodec(schema)
    val counts = graft.Commands.produce(spark, bus, "T", path,
      graft.streaming.RawStringCodec, codec)
    assert(counts == Map("T" -> 2L))
    val back = graft.Commands.consume(spark, bus, "T",
      graft.streaming.RawStringCodec, codec).toSeq
    assert(back.size == 2)
    assert(back.head.contains("op:\"c\"") && back.head.contains("n:10"))
  }
}
