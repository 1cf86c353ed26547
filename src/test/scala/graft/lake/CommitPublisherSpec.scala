package graft.lake

import graft.GraftSession
import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files
import java.util.concurrent.CountDownLatch

/** The conditional-PUT publish primitive must give the same multi-writer
  * guarantees the POSIX hard-link path gives: exactly one winner per
  * manifest name, losers observe the loss (and retry at the next sequence
  * number), readers never see a partial manifest.
  */
class CommitPublisherSpec extends AnyFunSuite {

  lazy val spark: SparkSession = GraftSession.local(4)

  val schema: StructType = StructType(Seq(
    StructField("kafka", StructType(Seq(
      StructField("topic", StringType), StructField("offset", LongType)))),
    StructField("v", LongType)))

  def batch(topic: String, offsets: Range): org.apache.spark.sql.DataFrame =
    spark.createDataFrame(spark.sparkContext.parallelize(
      offsets.map(o => Row(Row(topic, o.toLong), o.toLong * 10))), schema)

  test("conditional PUT: one winner among racing writers, content is the winner's") {
    val dir = Files.createTempDirectory("cput")
    val target = dir.resolve("00000001.txt")
    val pub = new CommitPublisher.ConditionalPut
    val n = 16
    val latch = new CountDownLatch(1)
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val results = (0 until n).map { i =>
      val tmp = dir.resolve(s".tmp-$i")
      Files.write(tmp, s"writer-$i".getBytes)
      Future { latch.await(); (i, pub.publish(target, tmp)) }
    }
    latch.countDown()
    val done = Await.result(Future.sequence(results), 60.seconds)
    val winners = done.filter(_._2)
    assert(winners.size == 1, s"expected one winner, got $winners")
    assert(new String(Files.readAllBytes(target)) == s"writer-${winners.head._1}")
  }

  test("conditional PUT: a pre-existing object (earlier process) counts as taken") {
    val dir = Files.createTempDirectory("cput-pre")
    val target = dir.resolve("00000001.txt")
    Files.write(target, "earlier process".getBytes)
    val tmp = dir.resolve(".tmp")
    Files.write(tmp, "latecomer".getBytes)
    assert(!new CommitPublisher.ConditionalPut().publish(target, tmp))
    assert(new String(Files.readAllBytes(target)) == "earlier process")
  }

  /** One two-JVM race over `count` names (through the HTTP server when
    * `base` is set, straight link(2) otherwise). The CORRECTNESS
    * invariants — disjoint winner sets, every name claimed exactly once,
    * the on-disk body is the winner's — are asserted unconditionally.
    * Returns the two win sets so the caller can judge whether the race
    * actually observed contention (a loaded box can starve one JVM into
    * winning nothing, which proves nothing either way — see the retry
    * loops at the call sites).
    */
  private def raceTwoProcesses(prefix: String, count: Int,
                               base: Option[String]): (Set[Int], Set[Int]) = {
    val dir = Files.createTempDirectory(prefix)
    val javaBin = System.getProperty("java.home") + "/bin/java"
    val cp = System.getProperty("java.class.path")
    def spawn(id: String) = new ProcessBuilder(
      (Seq(javaBin, "-cp", cp, "graft.lake.CPutRacer",
        dir.toString, id, count.toString) ++ base): _*)
      .redirectErrorStream(true).start()
    val (pa, pb) = (spawn("A"), spawn("B"))
    // start barrier: release only once BOTH JVMs are up and spinning, so
    // startup stagger can't let one process claim everything uncontended.
    // Generous deadline: a saturated box (32-core verify campaign in the
    // background) can take tens of seconds just to exec two JVMs.
    val up = System.nanoTime() + 180L * 1000 * 1000 * 1000
    while (!(Files.exists(dir.resolve("ready-A")) && Files.exists(dir.resolve("ready-B")))) {
      assert(System.nanoTime() < up, "racers did not come up within 180s")
      Thread.sleep(10)
    }
    Files.write(dir.resolve("go"), Array.emptyByteArray)
    def wins(p: Process): Set[Int] = {
      val out = new String(p.getInputStream.readAllBytes())
      assert(p.waitFor(180, java.util.concurrent.TimeUnit.SECONDS), s"racer hung:\n$out")
      assert(p.exitValue() == 0, s"racer failed:\n$out")
      out.linesIterator.filter(_.startsWith("WIN ")).map(_.drop(4).trim.toInt).toSet
    }
    val (winsA, winsB) = (wins(pa), wins(pb))
    assert((winsA & winsB).isEmpty, s"both processes won: ${winsA & winsB}")
    assert(winsA ++ winsB == (0 until count).toSet, "every name has exactly one winner")
    for (seq <- 0 until count) {
      val body = new String(Files.readAllBytes(dir.resolve(f"seq-$seq%05d")))
      val owner = if (winsA(seq)) "A" else "B"
      assert(body == s"writer-$owner-$seq", s"seq $seq: body is not the winner's: $body")
    }
    (winsA, winsB)
  }

  /** Re-race until both JVMs win at least one name. A race where one side
    * wins everything is CORRECT (all invariants held above) but vacuous —
    * it observed no contention — and under heavy external load the OS can
    * starve one JVM long enough for exactly that. Retrying makes the
    * contention evidence robust without ever weakening the invariants,
    * which are asserted on every attempt.
    */
  private def raceUntilContended(prefix: String, count: Int,
                                 base: Option[String]): Unit = {
    val contended = (1 to 3).exists { attempt =>
      val (winsA, winsB) = raceTwoProcesses(s"$prefix-$attempt", count, base)
      winsA.nonEmpty && winsB.nonEmpty
    }
    assert(contended, "no contention observed in 3 races (one JVM starved every time)")
  }

  test("conditional PUT: two OS processes racing the same sequence numbers, one winner each") {
    // The claim the in-thread race above cannot make: the arbiter is the
    // FILESYSTEM (link(2) EEXIST), not anything process-local, so writers
    // in different JVMs contending for the same manifest names still get
    // exactly one winner per name and the loser observes the loss.
    raceUntilContended("cput-xproc", 200, None)
  }

  test("HTTP conditional PUT: two OS processes racing through the server, one winner per name") {
    // The production shape: arbitration happens SERVER-side (If-None-Match
    // PUT → 201/412), not in any client process — so two separate JVMs
    // racing the same sequence numbers through HttpConditionalPut must
    // still get exactly one winner per name, with the on-disk object being
    // the winner's body. Proves the store binding is a drop-in for the
    // filesystem publishers.
    val srv = CPutHttpServer.start()
    try {
      raceUntilContended("cput-http", 200,
        Some(s"http://127.0.0.1:${srv.getAddress.getPort}"))
    } finally srv.stop(0)
  }

  test("HTTP conditional PUT: pre-existing object 412s, unconditional PUT is rejected") {
    val srv = CPutHttpServer.start()
    try {
      val base = java.net.URI.create(s"http://127.0.0.1:${srv.getAddress.getPort}")
      val dir = Files.createTempDirectory("cput-http-pre")
      val target = dir.resolve("00000001.txt")
      val tmp = dir.resolve(".tmp")
      Files.write(tmp, "first".getBytes)
      val pub = new HttpConditionalPut(base)
      assert(pub.publish(target, tmp))
      assert(new String(Files.readAllBytes(target)) == "first")
      Files.write(tmp, "second".getBytes)
      assert(!pub.publish(target, tmp), "existing object must 412")
      assert(new String(Files.readAllBytes(target)) == "first")
      // a client that drops the precondition header is a protocol bug the
      // server refuses outright (never a silent overwrite)
      val raw = java.net.http.HttpClient.newHttpClient()
      val resp = raw.send(java.net.http.HttpRequest.newBuilder(
          base.resolve("/" + java.net.URLEncoder.encode(target.toAbsolutePath.toString, "UTF-8")))
        .PUT(java.net.http.HttpRequest.BodyPublishers.ofString("clobber")).build(),
        java.net.http.HttpResponse.BodyHandlers.discarding())
      assert(resp.statusCode() == 400)
      assert(new String(Files.readAllBytes(target)) == "first")
    } finally srv.stop(0)
  }

  test("concurrent appends through conditional PUT: every commit lands exactly once") {
    val root = Files.createTempDirectory("pool-cput").toString
    // separate Pool instances on the same root = separate writer processes
    Pool.create(spark, root, "C", publisher = new CommitPublisher.ConditionalPut)
    val writers = 8
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val ids = Await.result(
      Future.sequence((0 until writers).map(i => Future {
        Pool.open(spark, root, "C", new CommitPublisher.ConditionalPut)
          .append(batch(s"t$i", 0 until 10))
      })), 120.seconds)
    assert(ids.toSet.size == writers, s"duplicate commit ids: $ids")
    val p = Pool.open(spark, root, "C", new CommitPublisher.ConditionalPut)
    assert(p.commits().size == writers)
    assert(p.read().count() == writers * 10L)
    val perTopic = p.read().groupBy("kafka.topic").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(perTopic == (0 until writers).map(i => s"t$i" -> 10L).toMap)
    assert(p.vacuum(graceMs = 0L) == 0, "no dead files after contended appends")
  }

  test("compact through conditional PUT aborts on conflict like the hard-link path") {
    val root = Files.createTempDirectory("pool-cput-cmp").toString
    val p = Pool.create(spark, root, "K", publisher = new CommitPublisher.ConditionalPut)
    p.append(batch("a", 0 until 5))
    p.append(batch("a", 5 until 9))
    assert(p.compact() != "conflict")
    assert(p.read().count() == 9)
    assert(p.nextProducerOffsets() == Map("a" -> 9L))
  }
}
