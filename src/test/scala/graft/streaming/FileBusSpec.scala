package graft.streaming

import graft.GraftSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** FileBus is the durable CLI transport (Main produce / from-kafka
  * workflows), so its write path must stream the frame through the driver
  * partition-by-partition (`toLocalIterator`, like the consume paths) —
  * never `collect()` it whole. These pin the streaming semantics a
  * collect() cannot produce, plus the ordered round trip at a size that
  * matters.
  */
class FileBusSpec extends AnyFunSuite {

  lazy val spark = GraftSession.local(4)

  test("large produce round-trips in _off order with exact counts") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("filebus-large").toString
    val bus = new FileBus(root)
    val n = 2000
    val df = (0 until n).map(i => ("big", i.toLong, s"k$i", f"v$i%05d"))
      .toDF("topic", "_off", "key", "value")
      .repartition(8) // partitions deliberately scrambled; _off sort restores
    val counts = bus.write(df)
    assert(counts == Map("big" -> n.toLong))
    assert(bus.endOffsets(Seq("big")) == Map("big" -> n.toLong))
    val back = bus.readBatch(spark, Seq("big"), Map("big" -> 0L))
      .orderBy("offset").select(col("value").cast("string")).collect()
      .map(_.getString(0)).toSeq
    assert(back == (0 until n).map(i => f"v$i%05d"))
  }

  test("concurrent multi-producer publishes land every record exactly once") {
    // the CAS loop changed in r15 (batch writers carry an offset cursor;
    // collisions re-list and resume): racing producers must still get
    // dense, exclusive offsets with no record lost or doubled
    val root = java.nio.file.Files.createTempDirectory("filebus-race").toString
    val bus = new FileBus(root)
    val threads = 4
    val per = 50
    val pool = java.util.concurrent.Executors.newFixedThreadPool(threads)
    try {
      val futures = (0 until threads).map { t =>
        pool.submit(new java.util.concurrent.Callable[Seq[Long]] {
          def call(): Seq[Long] = (0 until per).map(i =>
            bus.publish("race", s"$t".getBytes, s"$t-$i".getBytes))
        })
      }
      val offs = futures.flatMap(_.get(60, java.util.concurrent.TimeUnit.SECONDS))
      assert(offs.toSet.size == threads * per, "duplicate offsets handed out")
      assert(offs.toSet == (0L until (threads * per).toLong).toSet, "offsets not dense")
      val back = bus.readBatch(spark, Seq("race"), Map("race" -> 0L))
        .select(col("value").cast("string")).collect().map(_.getString(0)).toSet
      assert(back == (for (t <- 0 until threads; i <- 0 until per) yield s"$t-$i").toSet)
    } finally pool.shutdownNow()
  }

  test("write streams partitions: rows published before a failure persist") {
    // With the old collect(), a failure ANYWHERE in the frame meant zero
    // records hit disk (the whole frame materialized before the publish
    // loop). The streaming write walks partitions in order, so partition
    // 0's records are durably published before partition 1 is even
    // computed — Kafka produce semantics (acked records stay delivered).
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("filebus-fail").toString
    val bus = new FileBus(root)
    val rdd = spark.sparkContext.parallelize(0 until 20, 2)
      .mapPartitionsWithIndex { (i, it) =>
        if (i == 1) throw new RuntimeException("mid-stream failure")
        it.map(j => ("part", s"k$j", s"v$j"))
      }
    val df = rdd.toDF("topic", "key", "value")
    val e = intercept[Throwable] { bus.write(df) }
    val messages = Iterator.iterate(e)(_.getCause).takeWhile(_ != null)
      .map(t => Option(t.getMessage).getOrElse("")).mkString("\n")
    assert(messages.contains("mid-stream failure"), messages)
    // partition 0 (rows 0..9) was published before the failure surfaced
    assert(bus.endOffsets(Seq("part")) == Map("part" -> 10L),
      "streaming write should have published partition 0 before failing")
  }
}
