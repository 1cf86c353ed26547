package graft.zson

import graft.codecs.ZAvro
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

class ZsonSpec extends AnyFunSuite {

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
}
