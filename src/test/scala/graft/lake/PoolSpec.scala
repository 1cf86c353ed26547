package graft.lake

import graft.GraftSession
import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

class PoolSpec extends AnyFunSuite {

  lazy val spark: SparkSession = GraftSession.local(4)

  val schema: StructType = StructType(Seq(
    StructField("kafka", StructType(Seq(
      StructField("topic", StringType), StructField("offset", LongType)))),
    StructField("v", LongType)))

  def batch(topic: String, offsets: Range): org.apache.spark.sql.DataFrame =
    spark.createDataFrame(spark.sparkContext.parallelize(
      offsets.map(o => Row(Row(topic, o.toLong), o.toLong * 10))), schema)

  test("append commits are atomic and accumulate; offsets tracked per topic") {
    val root = Files.createTempDirectory("pool").toString
    val p = Pool.create(spark, root, "P")
    assert(p.isEmpty)
    p.append(batch("a", 0 until 5))
    p.append(batch("b", 0 until 3))
    p.append(batch("a", 5 until 8))
    assert(p.read().count() == 11)
    assert(p.nextProducerOffsets() == Map("a" -> 8L, "b" -> 3L))
    // key mismatch on reopen rejected
    assertThrows[IllegalArgumentException](
      Pool.create(spark, root, "P", key = "other"))
  }

  test("concurrent appends all commit exactly once (manifest CAS)") {
    val root = Files.createTempDirectory("pool-conc").toString
    val p = Pool.create(spark, root, "C")
    val writers = 8
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val ids = Await.result(
      Future.sequence((0 until writers).map(i => Future {
        p.append(batch(s"t$i", 0 until 10))
      })), 120.seconds)
    assert(ids.toSet.size == writers, s"duplicate commit ids: $ids")
    assert(p.commits().size == writers)
    assert(p.read().count() == writers * 10L)
    // every topic's rows survived intact — no lost or overwritten commit
    val perTopic = p.read().groupBy("kafka.topic").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(perTopic == (0 until writers).map(i => s"t$i" -> 10L).toMap)
    // a losing compact aborts cleanly rather than hiding commits
    assert(p.vacuum(graceMs = 0L) == 0, "no dead files after contended appends")
  }

  test("compact supersedes prior commits; vacuum removes dead files") {
    val root = Files.createTempDirectory("pool-c").toString
    val p = Pool.create(spark, root, "P")
    (0 until 5).foreach(i => p.append(batch("t", i * 10 until (i * 10 + 10))))
    val before = p.read().orderBy("kafka.offset").collect().map(_.toString).toSeq
    val dataDir = Paths.get(root, "P", "data")
    val filesBefore = Files.list(dataDir).iterator.asScala.size

    p.compact()
    val after = p.read().orderBy("kafka.offset").collect().map(_.toString).toSeq
    assert(after == before, "compaction must preserve contents")

    val removed = p.vacuum(graceMs = 0L)
    assert(removed > 0, s"vacuum should remove superseded files (had $filesBefore)")
    assert(p.read().orderBy("kafka.offset").collect().map(_.toString).toSeq == before)

    // appends after compaction still visible
    p.append(batch("t", 50 until 55))
    assert(p.read().count() == 55)
  }

  test("vacuum grace window spares freshly superseded files") {
    val root = Files.createTempDirectory("pool-grace").toString
    val p = Pool.create(spark, root, "G")
    p.append(batch("a", 0 until 5))
    p.append(batch("a", 5 until 9))
    p.compact()
    // files superseded milliseconds ago survive a 1-hour grace vacuum...
    assert(p.vacuum(graceMs = 3600L * 1000L) == 0)
    // ...and the DEFAULT grace also spares them (append/vacuum race guard)
    assert(p.vacuum() == 0)
    assert(p.read().count() == 9)
    // ...and a zero-grace vacuum (safe here: no concurrent writers) collects
    assert(p.vacuum(graceMs = 0L) > 0)
    assert(p.read().count() == 9)
  }

  test("resume offsets come from manifest metadata — no parquet read") {
    val root = Files.createTempDirectory("pool-meta").toString
    val p = Pool.create(spark, root, "M")
    p.append(batch("a", 0 until 5))
    p.append(batch("b", 0 until 3))
    p.append(batch("a", 5 until 8))
    assert(p.manifestOffsets() == Some(Map("a" -> 7L, "b" -> 2L)))
    p.dataReads.set(0L)
    assert(p.nextProducerOffsets() == Map("a" -> 8L, "b" -> 3L))
    assert(p.dataReads.get() == 0L,
      "metadata-bearing pool must resolve resume offsets without a data scan")
  }

  test("legacy manifests (no #offsets) fall back to a scan; compact upgrades them") {
    val root = Files.createTempDirectory("pool-legacy").toString
    val p = Pool.create(spark, root, "L")
    p.append(batch("a", 0 until 5))
    // strip the metadata line from the manifest: a pre-metadata commit
    val commitsDir = Paths.get(root, "L", "_commits")
    val m = Files.list(commitsDir).iterator.asScala
      .filter(_.getFileName.toString.endsWith(".txt")).toSeq.head
    Files.write(m, Files.readAllLines(m).asScala
      .filterNot(_.startsWith("#offsets")).mkString("\n").getBytes)
    assert(p.manifestOffsets().isEmpty)

    p.dataReads.set(0L)
    assert(p.nextProducerOffsets() == Map("a" -> 5L)) // scan fallback still right
    assert(p.dataReads.get() > 0L)

    p.compact() // upgrade path: compact recomputes and records metadata
    assert(p.manifestOffsets() == Some(Map("a" -> 4L)))
    p.dataReads.set(0L)
    assert(p.nextProducerOffsets() == Map("a" -> 5L))
    assert(p.dataReads.get() == 0L)
  }

  test("commits without a kafka envelope contribute no offsets but keep metadata intact") {
    val root = Files.createTempDirectory("pool-nokafka").toString
    val p = Pool.create(spark, root, "N", key = "v")
    val plain = spark.createDataFrame(spark.sparkContext.parallelize(
      Seq(Row(1L), Row(2L))), StructType(Seq(StructField("v", LongType))))
    p.append(plain)
    assert(p.manifestOffsets() == Some(Map.empty[String, Long]))
    assert(p.nextProducerOffsets() == Map.empty)
  }

  test("readRange prunes non-overlapping files via manifest zone maps") {
    import org.apache.spark.sql.functions.col
    val root = Files.createTempDirectory("pool-zones").toString
    val p = Pool.create(spark, root, "Z")
    p.append(batch("t", 0 until 10))
    p.append(batch("t", 10 until 20))
    p.append(batch("t", 20 until 30))
    val allFiles = p.read().inputFiles.length

    // a tail scan opens only files that can hold offsets >= 25
    val tail = p.readRange(lower = Some(25L))
    assert(tail.inputFiles.length < allFiles,
      s"zone maps must prune: kept ${tail.inputFiles.length} of $allFiles")
    assert(tail.inputFiles.forall(_.contains("/data/")))
    // superset contract: exact predicate on top gives exactly read()'s rows
    val want = p.read().filter(col("kafka.offset") >= 25)
      .orderBy("kafka.offset").collect().toSeq
    assert(tail.filter(col("kafka.offset") >= 25)
      .orderBy("kafka.offset").collect().toSeq == want)

    // upper bound prunes the other direction
    val head = p.readRange(upper = Some(5L))
    assert(head.inputFiles.length < allFiles)
    assert(head.filter(col("kafka.offset") <= 5).count() == 6)

    // both bounds: a middle window keeps only the middle commit's files
    val mid = p.readRange(lower = Some(12L), upper = Some(17L))
    assert(mid.filter(col("kafka.offset").between(12, 17)).count() == 6)

    // fully out-of-range prunes everything (zero-column empty frame)
    assert(p.readRange(lower = Some(1000L)).columns.isEmpty)

    // compact rewrites keep (tight, recomputed) zone maps
    p.compact()
    val tail2 = p.readRange(lower = Some(25L))
    assert(tail2.filter(col("kafka.offset") >= 25)
      .orderBy("kafka.offset").collect().toSeq == want)
    assert(tail2.inputFiles.length <= p.read().inputFiles.length)
  }

  test("files without zone-map metadata are never pruned (legacy manifests)") {
    import org.apache.spark.sql.functions.col
    val root = Files.createTempDirectory("pool-zones-legacy").toString
    val p = Pool.create(spark, root, "ZL")
    p.append(batch("t", 0 until 10))
    p.append(batch("t", 10 until 20))
    // strip #ranges from every manifest: a pre-zone-map pool
    val commitsDir = Paths.get(root, "ZL", "_commits")
    Files.list(commitsDir).iterator.asScala
      .filter(_.getFileName.toString.endsWith(".txt")).foreach { m =>
        Files.write(m, Files.readAllLines(m).asScala
          .filterNot(_.startsWith("#ranges")).mkString("\n").getBytes)
      }
    val all = p.readRange(lower = Some(15L))
    assert(all.inputFiles.length == p.read().inputFiles.length,
      "no zone maps -> no pruning, never a wrong answer")
    assert(all.filter(col("kafka.offset") >= 15).count() == 5)
  }

  test("readAsOf returns consistent historical snapshots") {
    val root = Files.createTempDirectory("pool-t").toString
    val p = Pool.create(spark, root, "P")
    val c1 = p.append(batch("t", 0 until 4))
    val c2 = p.append(batch("t", 4 until 9))
    p.append(batch("t", 9 until 12))
    assert(p.commits().size == 3)
    assert(p.readAsOf(c1).count() == 4)
    assert(p.readAsOf(c2).count() == 9)
    assert(p.read().count() == 12)
  }
}
