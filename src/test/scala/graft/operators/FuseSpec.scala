package graft.operators

import graft.GraftSession
import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

class FuseSpec extends AnyFunSuite {

  lazy val spark: SparkSession = GraftSession.local(4)

  test("fuse widens nested structs, pads missing fields, widens numerics") {
    val a = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(Row(1L, Row("x", 1), 5))),
      StructType(Seq(
        StructField("id", LongType),
        StructField("v", StructType(Seq(
          StructField("s", StringType), StructField("n", IntegerType)))),
        StructField("only_a", IntegerType))))
    val b = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(Row(2L, Row(9L, true)))),
      StructType(Seq(
        StructField("id", LongType),
        StructField("v", StructType(Seq(
          StructField("n", LongType), StructField("flag", BooleanType)))))))

    val fused = Fuse.fuse(Seq(a, b))
    val schema = fused.schema
    assert(schema("v").dataType == StructType(Seq(
      StructField("s", StringType), StructField("n", LongType),
      StructField("flag", BooleanType))))
    assert(schema.fieldNames.toSeq == Seq("id", "v", "only_a"))
    val rows = fused.orderBy("id").collect().map(_.toString).toSeq
    assert(rows == Seq("[1,[x,1,null],5]", "[2,[null,9,true],null]"))
  }

  test("fuse rejects incompatible types") {
    assertThrows[IllegalArgumentException](
      Fuse.fuseType(StringType, StructType(Seq())))
  }
}
