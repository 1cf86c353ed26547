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

  // ---- hand-built wire-byte helpers (decode-direction goldens) ---------
  private def uv(v: Long): Array[Byte] = {
    val out = scala.collection.mutable.ArrayBuffer[Byte]()
    var x = v
    while ((x & ~0x7fL) != 0) { out += ((x & 0x7f) | 0x80).toByte; x >>>= 7 }
    out += x.toByte
    out.toArray
  }
  private def zz(v: Long): Array[Byte] = uv((v << 1) ^ (v >> 63))
  private def frame(kind: Int, payload: Array[Byte]): Array[Byte] =
    Array(((kind << 4) | (payload.length & 0xf)).toByte) ++
      uv(payload.length >> 4) ++ payload
  private def tagged(body: Array[Byte]): Array[Byte] = uv(body.length + 1L) ++ body
  private def stream(frames: Array[Byte]*): Array[Byte] =
    frames.reduce(_ ++ _) ++ Array(0xff.toByte)

  test("every primitive id 0-29 either decodes per spec or is rejected loudly") {
    import ZsonValue._
    def leF(f: Float): Array[Byte] = {
      val b = java.lang.Float.floatToIntBits(f)
      Array.tabulate(4)(i => ((b >> (8 * i)) & 0xff).toByte)
    }
    def leD(d: Double): Array[Byte] = {
      val b = java.lang.Double.doubleToLongBits(d)
      Array.tabulate(8)(i => ((b >> (8 * i)) & 0xff).toByte)
    }
    // id -> (value body bytes, expected decoded Z)
    val supported: Map[Int, (Array[Byte], Z)] = Map(
      0 -> (uv(200L), ZInt(200L)),                       // uint8
      1 -> (uv(60000L), ZInt(60000L)),                   // uint16
      2 -> (uv(4000000000L), ZInt(4000000000L)),         // uint32
      3 -> (uv(123456789L), ZInt(123456789L)),           // uint64
      6 -> (zz(-5L), ZInt(-5L)),                         // int8
      7 -> (zz(-300L), ZInt(-300L)),                     // int16
      8 -> (zz(123456L), ZInt(123456L)),                 // int32
      9 -> (zz(-987654321L), ZInt(-987654321L)),         // int64
      12 -> (zz(1500000000L), ZInt(1500000000L)),        // duration (ns)
      13 -> (zz(1709287200123456789L),                   // time (ns)
        ZTime(java.time.Instant.ofEpochSecond(1709287200L, 123456789L))),
      15 -> (leF(1.5f), ZFloat(1.5)),                    // float32
      16 -> (leD(-2.25), ZFloat(-2.25)),                 // float64
      23 -> (Array(1.toByte), ZBool(true)),              // bool
      24 -> (Array(0xde.toByte, 0xad.toByte), ZBytes(Array(0xde.toByte, 0xad.toByte))),
      25 -> ("héllo".getBytes("UTF-8"), ZString("héllo")), // string
      26 -> (Array(1, 2, 3, 4).map(_.toByte), ZString("1.2.3.4")), // ip
      28 -> ("int64".getBytes("UTF-8"), ZString("int64")), // type
      29 -> (Array.empty[Byte], ZNull))                  // null
    val unsupported = // uint128/256, int128/256, float16/128/256, decimals, net
      Seq(4, 5, 10, 11, 14, 17, 18, 19, 20, 21, 22, 27)
    assert(supported.keySet ++ unsupported == (0 to 29).toSet,
      "the two sets must enumerate every primitive id exactly once")

    supported.foreach { case (id, (body, want)) =>
      val bytes = stream(frame(1, uv(id.toLong) ++ tagged(body)))
      val got = Zng.parse(bytes)
      assert(got.size == 1, s"id $id")
      (got.head.z, want) match {
        case (ZBytes(a), ZBytes(b)) => assert(a.toSeq == b.toSeq, s"id $id")
        case (g, w) => assert(g == w, s"id $id")
      }
    }
    unsupported.foreach { id =>
      val bytes = stream(frame(1, uv(id.toLong) ++ tagged(Array(0.toByte))))
      val e = intercept[IllegalArgumentException](Zng.parse(bytes))
      assert(e.getMessage.contains("unsupported ZNG primitive"), s"id $id: $e")
    }
  }

  test("golden bytes: union and named-type typedefs decode per spec") {
    import ZsonValue._
    // types frame: typedef 30 = union(int64, string); 31 = named foo=30
    val types = frame(0,
      Array(4.toByte) ++ uv(2) ++ uv(9) ++ uv(25) ++
        Array(7.toByte) ++ uv(3) ++ "foo".getBytes("UTF-8") ++ uv(30))
    // value of type 31: union body = tagged zigzag selector + tagged inner
    val unionBody = tagged(zz(1)) ++ tagged("hi".getBytes("UTF-8"))
    val values = frame(1, uv(31) ++ tagged(unionBody))
    val got = Zng.parse(stream(types ++ values))
    assert(got == Seq(Value(ZString("hi"), Some("foo"))))

    // selector 0 picks the int branch
    val v2 = frame(1, uv(31) ++ tagged(tagged(zz(0)) ++ tagged(zz(-7))))
    assert(Zng.parse(stream(types ++ v2)) == Seq(Value(ZInt(-7), Some("foo"))))
  }

  test("compressed write: C-bit frames on the wire, identical values back") {
    val schema = StructType(Seq(
      StructField("s", StringType), StructField("n", LongType)))
    val rows = (0 until 500).map(i => Row("text-" * 10 + i, i.toLong))
    val df = spark.createDataFrame(spark.sparkContext.parallelize(rows, 2), schema)
    val plain = tmp("plain.zng"); val comp = tmp("comp.zng")
    Zng.write(df, plain)
    Zng.write(df, comp, compress = true)
    val pBytes = Files.readAllBytes(java.nio.file.Paths.get(plain))
    val cBytes = Files.readAllBytes(java.nio.file.Paths.get(comp))
    assert(cBytes.length < pBytes.length, "LZ4 must shrink repetitive text")
    // walk the frames: the small types frame stays plain (below the
    // threshold), but at least one values frame must carry the C bit
    def frameCodes(bytes: Array[Byte]): Seq[Int] = {
      var pos = 0
      val codes = scala.collection.mutable.Buffer[Int]()
      while (pos < bytes.length && (bytes(pos) & 0xff) != 0xff) {
        val code = bytes(pos) & 0xff; pos += 1
        var shift = 0; var len = 0L; var b = 0x80
        while ((b & 0x80) != 0) {
          b = bytes(pos) & 0xff; len |= (b & 0x7fL) << shift; shift += 7; pos += 1
        }
        codes += code
        pos += ((len << 4) | (code & 0xf)).toInt
      }
      codes.toSeq
    }
    assert(frameCodes(cBytes).exists(c => (c & 0x40) != 0),
      "a values frame must carry the C bit")
    assert(frameCodes(pBytes).forall(c => (c & 0x40) == 0))
    val got = Zng.read(spark, comp).orderBy("n").collect().map(_.toString).toSeq
    val want = Zng.read(spark, plain).orderBy("n").collect().map(_.toString).toSeq
    assert(got == want && got.size == 500)
  }

  test("cross-codec: demo batch fixtures agree between ZSON and ZNG") {
    val fixtures = (1 to 4).map(i => s"/root/reference/demo/batch-$i.zson")
    fixtures.foreach { f =>
      assume(Files.exists(java.nio.file.Paths.get(f)))
      val fromZson = ZsonValue.read(spark, f)
      val path = tmp(new java.io.File(f).getName + ".zng")
      Zng.write(fromZson, path, compress = true)
      val fromZng = Zng.read(spark, path)
      assert(fromZng.columns.sorted.toSeq == fromZson.columns.sorted.toSeq, f)
      // ZSON text is the canonical comparison surface for both readers
      val want = Zson.renderAll(fromZson).toSeq.sorted
      val got = Zson.renderAll(fromZng).toSeq.sorted
      assert(got == want, f)
    }
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
