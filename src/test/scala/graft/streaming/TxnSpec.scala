package graft.streaming

import graft.GraftSession
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** Streaming transaction reassembly: bundles accumulate across
  * micro-batches and emit only when their done marker arrives.
  */
class TxnSpec extends AnyFunSuite {

  lazy val spark: SparkSession = GraftSession.local(4)

  test("bundles emit on done, surviving across micro-batches") {
    import spark.implicits._
    val dir = Files.createTempDirectory("txn-src")
    def write(name: String, lines: Seq[String]): Unit = {
      val tmp = dir.resolve(s".$name"); Files.write(tmp, lines.mkString("\n").getBytes)
      Files.move(tmp, dir.resolve(name))
    }
    // batch 1: txn 1 partial, txn 2 complete
    write("b1.json", Seq(
      """{"txn":1,"seqno":1,"payload":"a1","done":false}""",
      """{"txn":1,"seqno":2,"payload":"a2","done":false}""",
      """{"txn":2,"seqno":1,"payload":"b1","done":false}""",
      """{"txn":2,"seqno":2,"payload":"b-end","done":true}"""))

    val stream = spark.readStream
      .schema("txn LONG, seqno LONG, payload STRING, done BOOLEAN")
      .json(dir.toString)
      .as[TxnOps.TxnEvent]
    val q = TxnOps.assembleStream(stream)
      .writeStream.outputMode("append").format("memory").queryName("txn_out")
      .start()
    q.processAllAvailable()
    assert(spark.sql("SELECT txn FROM txn_out").collect().map(_.getLong(0)).toSeq
      == Seq(2L), "only the completed txn emits")

    // batch 2: txn 1 completes -> bundle includes batch-1 records in order
    write("b2.json", Seq("""{"txn":1,"seqno":3,"payload":"a-end","done":true}"""))
    q.processAllAvailable()
    q.stop()

    val bundles = spark.sql("SELECT txn, records, n FROM txn_out ORDER BY txn")
      .collect().map(r => (r.getLong(0), r.getSeq[String](1).toList, r.getLong(2)))
    assert(bundles.toSeq == Seq(
      (1L, List("a1", "a2", "a-end"), 3L),
      (2L, List("b1", "b-end"), 2L)))
  }

  test("abandoned transactions dead-letter after the event-time TTL") {
    import spark.implicits._
    val dir = Files.createTempDirectory("txn-ttl-src")
    def write(name: String, lines: Seq[String]): Unit = {
      val tmp = dir.resolve(s".$name"); Files.write(tmp, lines.mkString("\n").getBytes)
      Files.move(tmp, dir.resolve(name))
    }
    // txn 1 never completes; txn 2 completes immediately
    write("b1.json", Seq(
      """{"txn":1,"seqno":1,"payload":"a1","done":false,"ts":"2024-01-01T00:00:00Z"}""",
      """{"txn":2,"seqno":1,"payload":"b1","done":false,"ts":"2024-01-01T00:00:01Z"}""",
      """{"txn":2,"seqno":2,"payload":"b-end","done":true,"ts":"2024-01-01T00:00:02Z"}"""))

    val stream = spark.readStream
      .schema("txn LONG, seqno LONG, payload STRING, done BOOLEAN, ts TIMESTAMP")
      .json(dir.toString)
      .withWatermark("ts", "2 seconds")
      .as[TxnOps.TimedTxnEvent]
    val q = TxnOps.assembleStreamWithTtl(stream, ttlMs = 5000L)
      .writeStream.outputMode("append").format("memory").queryName("txn_ttl_out")
      .start()
    q.processAllAvailable()
    assert(spark.sql("SELECT txn FROM txn_ttl_out").collect()
      .map(_.getLong(0)).toSeq == Seq(2L), "txn 1 still buffered, not timed out")

    // advance the watermark well past txn 1's deadline (00:00:00 + 5 s TTL,
    // watermark delay 2 s -> any event at 00:01:00 pushes the watermark past)
    write("b2.json", Seq(
      """{"txn":3,"seqno":1,"payload":"c1","done":false,"ts":"2024-01-01T00:01:00Z"}"""))
    q.processAllAvailable()
    // one more batch so the timed-out state actually fires (timeouts are
    // evaluated when a batch runs against the advanced watermark)
    write("b3.json", Seq(
      """{"txn":3,"seqno":2,"payload":"c2","done":false,"ts":"2024-01-01T00:01:01Z"}"""))
    q.processAllAvailable()
    q.stop()

    val dead = spark.sql(
      "SELECT txn, records, n FROM txn_ttl_out WHERE NOT complete")
      .collect().map(r => (r.getLong(0), r.getSeq[String](1).toList, r.getLong(2)))
    assert(dead.toSeq == Seq((1L, List("a1"), 1L)), "txn 1 dead-letters with its partial bundle")
  }

  test("ops metrics: completed / timed-out / in-flight counters move") {
    import spark.implicits._
    val dir = Files.createTempDirectory("txn-metrics-src")
    def write(name: String, lines: Seq[String]): Unit = {
      val tmp = dir.resolve(s".$name"); Files.write(tmp, lines.mkString("\n").getBytes)
      Files.move(tmp, dir.resolve(name))
    }
    // txn 1 abandoned, txn 2 completes, txn 3 stays in flight
    write("b1.json", Seq(
      """{"txn":1,"seqno":1,"payload":"a1","done":false,"ts":"2024-01-01T00:00:00Z"}""",
      """{"txn":2,"seqno":1,"payload":"b1","done":false,"ts":"2024-01-01T00:00:01Z"}""",
      """{"txn":2,"seqno":2,"payload":"b-end","done":true,"ts":"2024-01-01T00:00:02Z"}"""))

    val metrics = new StreamMetrics.TxnMetrics(spark)
    val gauge = new StreamMetrics.StateGaugeListener
    spark.streams.addListener(gauge)
    val stream = spark.readStream
      .schema("txn LONG, seqno LONG, payload STRING, done BOOLEAN, ts TIMESTAMP")
      .json(dir.toString)
      .withWatermark("ts", "2 seconds")
      .as[TxnOps.TimedTxnEvent]
    val q = TxnOps.assembleStreamWithTtl(stream, ttlMs = 5000L, Some(metrics))
      .writeStream.outputMode("append").format("memory").queryName("txn_m_out")
      .start()
    try {
      q.processAllAvailable()
      assert(metrics.completed.value == 1L, "txn 2 completed")
      assert(metrics.timedOut.value == 0L)
      assert(metrics.inFlight.value == 1L, "txn 1 buffered")

      // push the watermark past txn 1's deadline, then one more batch so
      // the timeout fires
      write("b2.json", Seq(
        """{"txn":3,"seqno":1,"payload":"c1","done":false,"ts":"2024-01-01T00:01:00Z"}"""))
      q.processAllAvailable()
      write("b3.json", Seq(
        """{"txn":3,"seqno":2,"payload":"c2","done":false,"ts":"2024-01-01T00:01:01Z"}"""))
      q.processAllAvailable()
      assert(metrics.timedOut.value == 1L, "txn 1 dead-lettered")
      assert(metrics.completed.value == 1L)
      assert(metrics.inFlight.value == 1L, "txn 3 still buffered")

      // the engine-level gauge observed the buffered state (progress
      // events are async — poll briefly)
      val deadline = System.currentTimeMillis() + 20000
      while (gauge.stateRows(q.id).isEmpty && System.currentTimeMillis() < deadline)
        Thread.sleep(100)
      assert(gauge.stateRows(q.id).exists(_ >= 1L),
        s"state gauge saw ${gauge.stateRows(q.id)} rows")
    } finally {
      q.stop()
      spark.streams.removeListener(gauge)
    }
  }
}
