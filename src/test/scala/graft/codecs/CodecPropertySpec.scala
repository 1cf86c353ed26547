package graft.codecs

import graft.GraftSession
import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Property-based round-trip tests for both codecs — the upgrade of the
  * reference's table-driven round-trip test
  * (connectjson/connectjson_test.go:12-54) to generated values.
  */
class CodecPropertySpec extends AnyFunSuite {

  /** Deterministic sampling (scalacheck Gen without the scalatestplus
    * bridge, which is not in the offline cache).
    */
  def samples[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(42L + i)))

  lazy val spark: SparkSession = GraftSession.local(4)

  val schema: StructType = StructType(Seq(
    StructField("s", StringType), StructField("l", LongType),
    StructField("i", IntegerType), StructField("d", DoubleType),
    StructField("b", BooleanType), StructField("raw", BinaryType),
    StructField("nested", StructType(Seq(
      StructField("x", LongType), StructField("tags", ArrayType(StringType)))))))

  // printable-ish strings incl. JSON-hostile characters
  val genStr: Gen[String] = Gen.oneOf(
    Gen.alphaNumStr,
    Gen.listOf(Gen.oneOf('a', '"', '\\', '\n', '\t', 'é', '中', ' ', '{', '[')).map(_.mkString))
  val genRow: Gen[Row] = for {
    s <- Gen.option(genStr)
    l <- Gen.option(Gen.chooseNum(Long.MinValue + 1, Long.MaxValue))
    i <- Gen.option(Gen.chooseNum(Int.MinValue, Int.MaxValue))
    d <- Gen.option(Gen.oneOf(Gen.chooseNum(-1e12, 1e12), Gen.const(0.25)))
    b <- Gen.option(Gen.oneOf(true, false))
    raw <- Gen.option(Gen.listOf(Gen.chooseNum(-128, 127).map(_.toByte)).map(_.toArray))
    x <- Gen.option(Gen.chooseNum(Long.MinValue + 1, Long.MaxValue))
    tags <- Gen.option(Gen.listOf(genStr))
    nestedNull <- Gen.prob(0.2)
  } yield Row(s.orNull, l.map(Long.box).orNull, i.map(Int.box).orNull,
    d.map(Double.box).orNull, b.map(Boolean.box).orNull, raw.orNull,
    if (nestedNull) null else Row(x.map(Long.box).orNull, tags.map(_.toSeq).orNull))

  def canon(r: Row): String = {
    def v(x: Any): String = x match {
      case null => "∅"
      case b: Array[Byte] => b.map(y => f"$y%02x").mkString
      case row: Row => row.toSeq.map(v).mkString("(", ",", ")")
      case seq: scala.collection.Seq[_] => seq.map(v).mkString("[", ",", "]")
      case other => String.valueOf(other)
    }
    r.toSeq.map(v).mkString("|")
  }

  /** Connect cannot express arrays (parity with connectjson.go:146-147),
    * so its property drops the tags field.
    */
  val connectSchema: StructType = StructType(Seq(
    StructField("s", StringType), StructField("l", LongType),
    StructField("i", IntegerType), StructField("d", DoubleType),
    StructField("b", BooleanType), StructField("raw", BinaryType),
    StructField("nested", StructType(Seq(StructField("x", LongType))))))

  def dropTags(r: Row): Row = Row(r.toSeq.dropRight(1) :+
    (r.get(6) match { case null => null; case n: Row => Row(n.get(0)) }): _*)

  def roundTrip(rowsIn: Seq[Row], codec: String): Unit = {
    val (rows, schema) =
      if (codec == "connect") (rowsIn.map(dropTags), connectSchema)
      else (rowsIn, this.schema)
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2), schema)
    val v = struct(df.columns.map(col): _*)
    val back = codec match {
      case "connect" =>
        df.select(ConnectJson.decode(ConnectJson.encode(v, schema), schema).as("v"))
      case "avro" =>
        val reg = new InMemorySchemaRegistry
        df.select(ZAvro.decodeColumn(
          ZAvro.encodeColumn(v, schema, "ns", reg), schema, reg).as("v"))
    }
    val got = back.select("v.*").collect().map(canon).sorted.toSeq
    val want = df.collect().map(canon).sorted.toSeq
    assert(got == want)
  }

  test("connect-json round-trips arbitrary rows") {
    samples(Gen.listOfN(20, genRow), 8).foreach(rows => roundTrip(rows, "connect"))
  }

  test("registry-avro round-trips arbitrary rows") {
    samples(Gen.listOfN(20, genRow), 8).foreach(rows => roundTrip(rows, "avro"))
  }

  test("both codecs round-trip generated timestamps (µs precision)") {
    // ±~126 years of epoch micros: ns (µs*1000) stays within Long for the
    // Connect wire format, and Avro timestamp-micros is exact by design
    val tsSchema = StructType(Seq(
      StructField("id", LongType), StructField("ts", TimestampType)))
    val genTsRow: Gen[Row] = for {
      id <- Gen.chooseNum(0L, 1L << 40)
      us <- Gen.option(Gen.chooseNum(-4000000000000000L, 4000000000000000L))
    } yield Row(id, us.map(u => java.sql.Timestamp.from(
      java.time.Instant.ofEpochSecond(Math.floorDiv(u, 1000000L),
        Math.floorMod(u, 1000000L) * 1000L))).orNull)

    samples(Gen.listOfN(25, genTsRow), 6).foreach { rows =>
      val df = spark.createDataFrame(spark.sparkContext.parallelize(rows, 2), tsSchema)
      val v = struct(df.columns.map(col): _*)
      val want = df.collect().map(canon).sorted.toSeq
      val viaConnect = df.select(
        ConnectJson.decode(ConnectJson.encode(v, tsSchema), tsSchema).as("v"))
        .select("v.*").collect().map(canon).sorted.toSeq
      assert(viaConnect == want, "connect-json timestamp round trip")
      val reg = new InMemorySchemaRegistry
      val viaAvro = df.select(ZAvro.decodeColumn(
        ZAvro.encodeColumn(v, tsSchema, "ns", reg), tsSchema, reg).as("v"))
        .select("v.*").collect().map(canon).sorted.toSeq
      assert(viaAvro == want, "registry-avro timestamp round trip")
    }
  }
}
