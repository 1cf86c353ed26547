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
}
