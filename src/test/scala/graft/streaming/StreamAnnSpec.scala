package graft.streaming

import graft.GraftSession
import graft.ml.{IvfIndex, IvfPq}
import graft.sources.Tables
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** The streaming ANN ingest sinks ([[StreamAnn]]): exactly-once appends
  * under foreachBatch replay, the unprompted maintenance tick, and the
  * generation-flip discipline — successor pointer at the origin, stream
  * mark carried into the new generation BEFORE the flip (the
  * crash-after-flip replay window), intermediate generations retired.
  */
class StreamAnnSpec extends AnyFunSuite {

  lazy val spark = GraftSession.local(4)

  private val sfDir = "/root/testdata/sf0.001"

  private def corpus: DataFrame = Tables.embeddings(spark, sfDir)
    .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))

  private def base: DataFrame = corpus.filter(col("vec_id") % 7 =!= 0)

  /** Batch b: in-distribution vectors (base rows under fresh ids), so the
    * maintenance tick sees fragmentation, not drift.
    */
  private def batchOf(b: Int): DataFrame = corpus
    .filter(col("vec_id") % 7 === 0 && col("vec_id") % 28 === (b % 4) * 7)
    .select((col("vec_id") + lit((b + 1) * 1000000L)).as("vec_id"), col("v"))

  private def storedIds(path: String): Set[Long] =
    spark.read.parquet(s"$path/cells").select("vec_id")
      .collect().map(_.getLong(0)).toSet

  private val tickPolicy = IvfIndex.MaintainPolicy(
    maxFilesPerCell = 2, targetFilesPerCell = 1,
    mergeFraction = 0.01, driftTol = 0.5,
    recallQueries = 8, k = 3, nprobe = 2)

  test("IVF sink: exactly-once appends, maintenance flip is durable, restart resumes live generation") {
    val origin = IvfIndex.build(base,
      Files.createTempDirectory("stream-ivf").toString, cells = 4)
    val expected = storedIds(origin.path) ++
      (0 to 3).flatMap(b => batchOf(b).select("vec_id")
        .collect().map(_.getLong(0)))

    var ticks = List.empty[(Long, IvfIndex.MaintainResult)]
    val sink = StreamAnn.ivfForeachBatch(origin, maintainEvery = 4,
      tickPolicy) { (b, r) => ticks ::= (b, r) }
    for (b <- 0 to 3) sink(batchOf(b), b.toLong)

    // the tick ran at batch 3 and compacted the append fragmentation
    assert(ticks.map(_._1) == List(3L), s"tick schedule: $ticks")
    val live = IvfIndex.resolveLive(origin)
    assert(live.path != origin.path,
      "4 appends at maxFilesPerCell=2 must fragment past the budget and flip")
    assert(ticks.head._2.action == "compact", ticks.head._2.action)
    assert(storedIds(live.path) == expected, "flip lost or duplicated rows")
    // the flip carried the stream mark: a crash-after-flip replay of
    // batch 3 against the new generation must be a no-op, not a re-append
    assert(IvfIndex.streamMark(spark, live.path)._1 == 3L)

    // restart: a rebuilt closure (fresh query lineage is the norm only
    // for NEW checkpoints; same checkpoint keeps its queryId) resumes on
    // the live generation and skip-replays the delivered batch
    val sink2 = StreamAnn.ivfForeachBatch(origin, maintainEvery = 4,
      tickPolicy)()
    sink2(batchOf(3), 3L)
    assert(storedIds(live.path) == expected,
      "replay after restart must not duplicate")
    // and genuinely new batches land in the live generation
    val b4 = batchOf(0).select((col("vec_id") + 5000000L).as("vec_id"), col("v"))
    sink2(b4, 4L)
    assert(storedIds(IvfIndex.resolveLive(origin).path) ==
      expected ++ b4.select("vec_id").collect().map(_.getLong(0)))
  }

  test("IVF sink: second flip retires the intermediate generation, never the origin") {
    val origin = IvfIndex.build(base,
      Files.createTempDirectory("stream-ivf2").toString, cells = 4)
    val sink = StreamAnn.ivfForeachBatch(origin, maintainEvery = 2,
      tickPolicy)()
    for (b <- 0 to 5) sink(batchOf(b), b.toLong)
    val live = IvfIndex.resolveLive(origin)
    val originDir = new java.io.File(origin.path)
    assert(originDir.exists, "origin must survive every flip (it holds the pointer)")
    // one-hop chain: the pointer at the origin always names the LIVE gen
    assert(origin.successor.map(_.path).contains(live.path))
    // generations between origin and live are retired (allow the live
    // one plus bounded crash orphans — none here, clean run)
    val parent = originDir.getParentFile
    val gens = parent.listFiles().map(_.getName)
      .filter(_.startsWith(originDir.getName + "@g"))
    assert(gens.length == 1, s"intermediate generations not retired: ${gens.toList}")
  }

  test("ANN lineage guard: fresh checkpoint fails fast; resetStreamMark re-binds") {
    val idx = IvfIndex.build(base,
      Files.createTempDirectory("stream-ivf3").toString, cells = 4)
    assert(IvfIndex.appendBatch(idx, batchOf(0), 0L, Some("qA")))
    assert(IvfIndex.appendBatch(idx, batchOf(1), 1L, Some("qA")))
    val n = storedIds(idx.path).size
    val e = intercept[IllegalStateException] {
      IvfIndex.appendBatch(idx, batchOf(2), 0L, Some("qB"))
    }
    assert(e.getMessage.contains("qA") && e.getMessage.contains("qB"))
    IvfIndex.resetStreamMark(spark, idx.path)
    val before = storedIds(idx.path)
    assert(IvfIndex.appendBatch(idx, batchOf(2), 0L, Some("qB")))
    // per-batch file names are lineage-scoped: qB's restarted batch 0
    // must NOT sweep qA's committed batch-0 files of the same number
    val after = storedIds(idx.path)
    assert(before.subsetOf(after), "re-bound batch 0 swept qA's committed rows")
    assert(after.size == n + batchOf(2).count())
    assert(IvfIndex.streamMark(spark, idx.path) == ((0L, Some("qB"))))
  }

  test("real stream: lineage binds via sql.streaming.queryId; fresh checkpoint fails fast until reset") {
    import spark.implicits._
    def vecs(ids: Range): Seq[(Long, Array[Double])] = ids.map { i =>
      (i.toLong, Array.tabulate(4)(d => math.sin(i * 7.0 + d) + (if (i % 2 == 0) 2.0 else -2.0)))
    }
    val idx = IvfIndex.build(vecs(0 until 8).toDF("vec_id", "v"),
      Files.createTempDirectory("stream-real-ivf").toString,
      cells = 2, trainIters = 2)

    val dir = Files.createTempDirectory("stream-real-src")
    def writeBatch(name: String, ids: Range): Unit = {
      val lines = vecs(ids).map { case (id, v) =>
        s"""{"vec_id":$id,"v":[${v.mkString(",")}]}""" }
      val tmp = dir.resolve(s".$name")
      Files.write(tmp, lines.mkString("\n").getBytes)
      Files.move(tmp, dir.resolve(name))
      ()
    }
    def start(ckpt: java.nio.file.Path) = spark.readStream
      .schema("vec_id LONG, v ARRAY<DOUBLE>").json(dir.toString)
      .writeStream
      .foreachBatch(StreamAnn.ivfForeachBatch(idx)())
      .option("checkpointLocation", ckpt.toString)
      .start()

    val ckpt = Files.createTempDirectory("stream-real-ckpt")
    writeBatch("b1.json", 100 until 104)
    val q = start(ckpt)
    q.processAllAvailable()
    writeBatch("b2.json", 200 until 204)
    q.processAllAvailable()
    q.stop()
    assert(storedIds(idx.path).size == 16)
    // the mark carries the QUERY id (stable across restarts of the same
    // checkpoint) — proof the local property reached the sink
    val (hw, lineage) = IvfIndex.streamMark(spark, idx.path)
    assert(hw == 1L && lineage.contains(q.id.toString),
      s"mark ($hw, $lineage) vs query ${q.id}")

    // same checkpoint restart: same queryId, batch ids continue — fine
    writeBatch("b3.json", 300 until 304)
    val q2 = start(ckpt)
    q2.processAllAvailable()
    q2.stop()
    assert(q2.id == q.id && storedIds(idx.path).size == 20)

    // FRESH checkpoint over the same index: new queryId, batch ids
    // restart at 0 — the guard must kill the query, not skip silently
    writeBatch("b4.json", 400 until 404)
    val q3 = start(Files.createTempDirectory("stream-real-ckpt2"))
    val e = intercept[Exception] { q3.processAllAvailable() }
    def chain(t: Throwable): List[String] =
      if (t == null) Nil else t.getMessage :: chain(t.getCause)
    assert(chain(e).exists(m => m != null && m.contains("resetStreamMark")),
      s"expected the lineage fail-fast, got: ${chain(e)}")
    q3.stop()
    assert(storedIds(idx.path).size == 20, "no partial append from the killed query")

    // operator re-bind: reset, then point the new lineage at NEW data
    // only (a fresh checkpoint REPLAYS its source from scratch, and ANN
    // appends carry no content dedup — that replay-duplication is
    // exactly what the guard above refuses to let happen silently)
    IvfIndex.resetStreamMark(spark, idx.path)
    val dir2 = Files.createTempDirectory("stream-real-src2")
    val lines = vecs(400 until 404).map { case (id, v) =>
      s"""{"vec_id":$id,"v":[${v.mkString(",")}]}""" }
    Files.write(dir2.resolve("b4.json"), lines.mkString("\n").getBytes)
    val q4 = spark.readStream
      .schema("vec_id LONG, v ARRAY<DOUBLE>").json(dir2.toString)
      .writeStream
      .foreachBatch(StreamAnn.ivfForeachBatch(idx)())
      .option("checkpointLocation",
        Files.createTempDirectory("stream-real-ckpt3").toString)
      .start()
    q4.processAllAvailable()
    q4.stop()
    val rows = spark.read.parquet(s"${idx.path}/cells").count()
    assert(storedIds(idx.path).size == 24 && rows == 24L,
      s"re-bound lineage must append exactly its new rows (ids=${storedIds(idx.path).size}, rows=$rows)")
  }

  test("PQ sink retrain tick: an ahead-of-stream corpus provider imports nothing undelivered") {
    val origin = IvfPq.build(base,
      Files.createTempDirectory("stream-pq-retrain").toString, cells = 4, m = 4)
    // provider covers MORE than the stream has delivered (batches 0-3
    // appended; the provider also carries batch 9's future rows)
    val ahead = () => base
      .unionByName((0 to 3).map(batchOf).reduce(_.unionByName(_)))
      .unionByName(batchOf(9))
    // driftTol = -1 forces the retrain recommendation at the tick
    val sink = StreamAnn.ivfPqForeachBatch(origin, ahead, maintainEvery = 4,
      IvfPq.MaintainPolicy(driftTol = -1.0, recallQueries = 4, k = 3,
        nprobe = 3, auditShortlist = 50))()
    for (b <- 0 to 3) sink(batchOf(b), b.toLong)
    val live = IvfPq.resolveLive(origin)
    assert(live.path != origin.path, "forced retrain must flip")
    val delivered = base.select("vec_id").collect().map(_.getLong(0)).toSet ++
      (0 to 3).flatMap(b => batchOf(b).select("vec_id").collect().map(_.getLong(0)))
    assert(storedIds(live.path) == delivered,
      "retrain imported rows the stream has not delivered yet")
    // batch 9 arrives later: appended exactly once, not duplicated
    val sink2 = StreamAnn.ivfPqForeachBatch(origin, ahead, maintainEvery = 0)()
    sink2(batchOf(9), 9L)
    val after = storedIds(IvfPq.resolveLive(origin).path)
    assert(after == delivered ++ batchOf(9).select("vec_id").collect().map(_.getLong(0)))
  }

  test("PQ sink: exactly-once appends and a compacting flip carry the mark") {
    val origin = IvfPq.build(base,
      Files.createTempDirectory("stream-pq").toString, cells = 4, m = 4)
    val appended = () => (0 to 3).map(batchOf).reduce(_.unionByName(_))
    val sink = StreamAnn.ivfPqForeachBatch(origin,
      () => base.unionByName(appended()), maintainEvery = 4,
      IvfPq.MaintainPolicy(maxFilesPerCell = 2, targetFilesPerCell = 1,
        mergeFraction = 0.01, driftTol = 5.0,
        recallQueries = 8, k = 3, nprobe = 2, auditShortlist = 50))()
    for (b <- 0 to 3) sink(batchOf(b), b.toLong)
    val live = IvfPq.resolveLive(origin)
    assert(live.path != origin.path, "PQ tick must compact and flip")
    val expected = storedIds(origin.path) // origin retains pre-flip rows…
    // …but the LIVE generation is the authority: exactly the base + 4 batches
    val want = base.select("vec_id").collect().map(_.getLong(0)).toSet ++
      appended().select("vec_id").collect().map(_.getLong(0))
    assert(storedIds(live.path) == want)
    assert(IvfIndex.streamMark(spark, live.path)._1 == 3L)
    // replayed batch against the flipped generation: no-op
    val sink2 = StreamAnn.ivfPqForeachBatch(origin,
      () => base.unionByName(appended()), maintainEvery = 0)()
    sink2(batchOf(3), 3L)
    assert(storedIds(live.path) == want, "replay duplicated PQ codes")
    assert(expected.nonEmpty)
  }
}
