package graft.etl

import graft.GraftSession
import graft.lake.Pool
import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** Cursor range-limiting (the optimization the reference designed but never
  * implemented — etl/build.go:9-18): runs stay correct when done-sets have
  * gaps (out-of-order denorm completion), and the contiguous prefix skips
  * re-scanned records.
  */
class CursorSpec extends AnyFunSuite {

  lazy val spark: SparkSession = GraftSession.local(4)

  val schema: StructType = StructType(Seq(
    StructField("kafka", StructType(Seq(
      StructField("topic", StringType), StructField("offset", LongType)))),
    StructField("key", StructType(Seq(StructField("ID", LongType)))),
    StructField("value", StructType(Seq(
      StructField("op", StringType), StructField("x", LongType))))))

  def rows(offsets: Seq[Long]): org.apache.spark.sql.DataFrame =
    spark.createDataFrame(spark.sparkContext.parallelize(
      offsets.map(o => Row(Row("T", o), Row(o), Row("c", o * 10)))), schema)

  val yaml: String =
    """inputs:
      |  - topic: T
      |    pool: Raw
      |output:
      |  topic: O
      |  pool: Staging
      |transforms:
      |  - type: stateless
      |    in: T
      |    out: O
      |    zed: |
      |      | out:={ key: in.key, value: { x: in.value.x } }
      |""".stripMargin

  test("incremental runs with gapped done-sets stay exactly-once") {
    val root = Files.createTempDirectory("cursor").toString
    val raw = Pool.create(spark, root, "Raw")
    val transform = Transform.fromYaml(yaml)

    raw.append(rows(Seq(1L, 2L, 3L)))
    assert(new Pipeline(spark, transform, root).run() == 6) // 3 data + 3 done

    // out-of-order arrival BELOW the previous max: offset 0 lands late
    raw.append(rows(Seq(0L, 4L)))
    val p2 = new Pipeline(spark, transform, root)
    assert(p2.run() == 4, "late offset 0 and new offset 4 both process")

    // re-run: nothing left
    assert(new Pipeline(spark, transform, root).run() == 0)

    // all five offsets present exactly once in the output
    val out = Pool.open(spark, root, "Staging").read()
    val dataOffsets = out.filter("_type IS NULL")
      .select("value.x").collect().map(_.getLong(0)).sorted.toSeq
    assert(dataOffsets == Seq(0L, 10L, 20L, 30L, 40L))
    val doneOffsets = out.filter("_type = 'done'")
      .select("kafka.offset").collect().map(_.getLong(0)).sorted.toSeq
    assert(doneOffsets == Seq(0L, 1L, 2L, 3L, 4L))
  }
}
