package graft.streaming

import graft.GraftSession
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** Proves the window operators are genuinely streaming-valid: the same
  * windowedCounts plan runs as a Structured Streaming query over a file
  * source with watermarked append output, and sessionize() splits
  * gap-separated activity correctly.
  */
class WindowSpec extends AnyFunSuite {

  lazy val spark: SparkSession = GraftSession.local(4)

  test("windowedCounts runs as a streaming query with watermark") {
    val dir = Files.createTempDirectory("win-src")
    Files.write(dir.resolve("b1.json"), Seq(
      """{"ts":"2024-01-01T00:05:00.000Z","event_type":"a","user_id":1,"value":1.0}""",
      """{"ts":"2024-01-01T00:20:00.000Z","event_type":"a","user_id":1,"value":2.0}""",
      """{"ts":"2024-01-01T01:10:00.000Z","event_type":"b","user_id":2,"value":3.0}""",
      // watermark pusher: far-future event closes the earlier windows
      """{"ts":"2024-01-01T09:00:00.000Z","event_type":"b","user_id":2,"value":0.0}""")
      .mkString("\n").getBytes)

    val stream = spark.readStream
      .schema("ts TIMESTAMP, event_type STRING, user_id LONG, value DOUBLE")
      .json(dir.toString)
    val q = WindowOps.windowedCounts(stream, "1 hour", "1 hour", "10 minutes")
      .writeStream.outputMode("append")
      .format("memory").queryName("win_out")
      .start()
    q.processAllAvailable()
    q.stop()

    val rows = spark.sql(
      "SELECT event_type, n, total FROM win_out ORDER BY window_start, event_type")
      .collect().map(_.toString).toSeq
    // append mode emits only windows the watermark has closed
    assert(rows.contains("[a,2,3.0]"))
    assert(rows.contains("[b,1,3.0]"))
  }

  test("sessionize splits on inactivity gaps and aggregates per session") {
    import spark.implicits._
    val m = 60L * 1000000L
    val events = Seq(
      WindowOps.SessionEvent(1, 0 * m, 1.0),
      WindowOps.SessionEvent(1, 10 * m, 2.0),
      WindowOps.SessionEvent(1, 100 * m, 5.0), // 90-minute gap -> new session
      WindowOps.SessionEvent(2, 0 * m, 7.0)).toDS()
    val sessions = WindowOps.sessionize(events, gapMicros = 30 * m)
      .collect().sortBy(s => (s.user_id, s.startMicros)).toSeq
    assert(sessions == Seq(
      WindowOps.Session(1, 0, 10 * m, 2, 3.0),
      WindowOps.Session(1, 100 * m, 100 * m, 1, 5.0),
      WindowOps.Session(2, 0, 0, 1, 7.0)))
  }
}
