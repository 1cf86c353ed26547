package graft.streaming

import graft.GraftSession
import graft.lake.Pool
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** Structured-Streaming flavor of the from-kafka sync: a file-source stream
  * stands in for the Kafka source (same Bus.schema columns), foreachBatch
  * lands atomic pool commits, checkpointing carries offsets across query
  * restarts. Also covers the topic→pool fan-out routing.
  */
class StreamSpec extends AnyFunSuite {

  lazy val spark: SparkSession = GraftSession.local(4)

  test("streaming sync: micro-batches land as atomic pool commits") {
    val dir = Files.createTempDirectory("stream-src")
    val root = Files.createTempDirectory("stream-pool").toString
    val checkpoint = Files.createTempDirectory("stream-ckpt").toString
    val pool = Pool.create(spark, root, "S")

    def writeBatch(name: String, lines: Seq[String]): Unit = {
      val tmp = dir.resolve(s".$name"); val dst = dir.resolve(name)
      Files.write(tmp, lines.mkString("\n").getBytes)
      Files.move(tmp, dst)
    }
    writeBatch("b1.json", Seq(
      """{"topic":"T","partition":0,"offset":0,"key":null,"value":"one"}""",
      """{"topic":"T","partition":0,"offset":1,"key":null,"value":"two"}"""))

    val records = spark.readStream
      .schema("topic STRING, partition LONG, offset LONG, key STRING, value STRING")
      .json(dir.toString)
      .select(col("topic"), col("partition"), col("offset"),
        col("key").cast("binary"), col("value").cast("binary"))

    val from = new FromKafka(new MemoryBus, RawStringCodec, RawStringCodec)
    val q = from.streamFrom(records, pool, checkpoint)
    q.processAllAvailable()
    assert(pool.read().count() == 2)

    writeBatch("b2.json", Seq(
      """{"topic":"T","partition":0,"offset":2,"key":null,"value":"three"}"""))
    q.processAllAvailable()
    q.stop()

    val vals = pool.read().orderBy("kafka.offset").select("value")
      .collect().map(_.getString(0)).toSeq
    assert(vals == Seq("one", "two", "three"))
    // each micro-batch was one atomic commit
    assert(Files.list(java.nio.file.Paths.get(root, "S", "_commits")).count() == 2)
  }

  test("streaming sync recovers from checkpoint across query restarts") {
    val dir = Files.createTempDirectory("rst-src")
    val root = Files.createTempDirectory("rst-pool").toString
    val checkpoint = Files.createTempDirectory("rst-ckpt").toString
    val pool = Pool.create(spark, root, "R")
    def records = spark.readStream
      .schema("topic STRING, partition LONG, offset LONG, key STRING, value STRING")
      .json(dir.toString)
      .select(col("topic"), col("partition"), col("offset"),
        col("key").cast("binary"), col("value").cast("binary"))
    def write(name: String, lines: Seq[String]): Unit = {
      val tmp = dir.resolve(s".$name"); Files.write(tmp, lines.mkString("\n").getBytes)
      Files.move(tmp, dir.resolve(name))
    }
    val from = new FromKafka(new MemoryBus, RawStringCodec, RawStringCodec)

    write("b1.json", Seq("""{"topic":"T","partition":0,"offset":0,"key":null,"value":"one"}"""))
    val q1 = from.streamFrom(records, pool, checkpoint)
    q1.processAllAvailable(); q1.stop()
    assert(pool.read().count() == 1)

    // new query instance, same checkpoint: only the new file is processed
    write("b2.json", Seq("""{"topic":"T","partition":0,"offset":1,"key":null,"value":"two"}"""))
    val q2 = from.streamFrom(records, pool, checkpoint)
    q2.processAllAvailable(); q2.stop()
    val vals = pool.read().orderBy("kafka.offset").select("value")
      .collect().map(_.getString(0)).toSeq
    assert(vals == Seq("one", "two"), "no duplicates, no gaps after restart")
  }

  test("topic->pool fan-out routing (from-kafka poolToTopics)") {
    val bus = new MemoryBus
    val root = Files.createTempDirectory("routes").toString
    val poolA = Pool.create(spark, root, "A")
    val poolB = Pool.create(spark, root, "B")
    bus.publish("t1", null, "a1".getBytes)
    bus.publish("t2", null, "a2".getBytes)
    bus.publish("t3", null, "b1".getBytes)

    val from = new FromKafka(bus, RawStringCodec, RawStringCodec)
    val counts = from.syncRoutes(spark,
      Seq(poolA -> Seq("t1", "t2"), poolB -> Seq("t3")))
    assert(counts == Map("A" -> 2, "B" -> 1))
    assert(poolA.read().select("kafka.topic").distinct().count() == 2)
    assert(poolB.read().select("value").head().getString(0) == "b1")
  }

  test("streaming minhash-LSH flags near-dups against earlier arrivals") {
    val base = "the quick brown fox jumps over the lazy dog and then runs far " +
      "away across the wide green field toward the old stone bridge by the river"
    val nearDup = base.replace("green", "blue")   // one word of ~28: j ~ 0.9
    val distinct = "completely different content about spark catalyst plans " +
      "partition pruning broadcast joins and adaptive execution at scale"

    val dir = Files.createTempDirectory("sminhash-src")
    def writeBatch(name: String, lines: Seq[String]): Unit = {
      val tmp = dir.resolve(s".$name"); Files.write(tmp, lines.mkString("\n").getBytes)
      Files.move(tmp, dir.resolve(name))
    }
    def rec(id: Long, text: String, sec: Int) =
      s"""{"doc_id":$id,"text":"$text","ts":"2024-01-01T00:00:0$sec.000Z"}"""
    writeBatch("b1.json", Seq(rec(1, base, 0), rec(2, distinct, 1)))

    val stream = spark.readStream
      .schema("doc_id LONG, text STRING, ts TIMESTAMP")
      .json(dir.toString)
    val q = StreamDedup.minhashCandidates(stream, "ts", "10 minutes",
      ttlMs = 3600L * 1000)
      .writeStream.outputMode("append").format("memory").queryName("sminhash_out")
      .start()
    q.processAllAvailable()
    assert(spark.sql("SELECT * FROM sminhash_out").isEmpty,
      "first arrivals own their buckets - no candidates yet")

    // a later micro-batch: near-dup of doc 1 plus an exact re-send of doc 2
    writeBatch("b2.json", Seq(rec(3, nearDup, 2), rec(4, distinct, 3)))
    q.processAllAvailable()
    q.stop()

    val cands = spark.sql("SELECT DISTINCT doc_id, dup_of FROM sminhash_out")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(cands == Set((3L, 1L), (4L, 2L)),
      s"near-dup 3 pairs with owner 1, exact dup 4 with owner 2, got $cands")
  }

  test("store-backed streaming near-dup == batch probe-then-append on the same batches") {
    import graft.ml.MinHashStore
    import spark.implicits._
    val histDocs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog near the river bank today"),
      (2L, "spark structured streaming processes unbounded data with watermarks and stateful operators"),
      (3L, "a completely unrelated recipe for sourdough bread with a long fermentation schedule"))
      .toDF("doc_id", "text")
    val b1Docs = Seq(
      (101L, "spark structured streaming processes unbounded data with watermarks and stateful operators"), // dup of hist 2
      (103L, "an entirely fresh document about graph algorithms and connected components at scale"))
      .toDF("doc_id", "text")
    val b2Docs = Seq(
      (201L, "an entirely fresh document about graph algorithms and connected components at scale"), // CROSS-BATCH dup of 103
      (202L, "yet another document that matches nothing stored so far in any way"))
      .toDF("doc_id", "text")

    // two identically-built stores: one fed by the stream, one by the
    // equivalent batch sequence — the parity oracle
    val storeA = MinHashStore.build(histDocs,
      Files.createTempDirectory("mhs-stream").toString)
    val storeB = MinHashStore.build(histDocs,
      Files.createTempDirectory("mhs-batch").toString)

    val dir = Files.createTempDirectory("mhs-src")
    def writeBatch(name: String, lines: Seq[String]): Unit = {
      val tmp = dir.resolve(s".$name"); Files.write(tmp, lines.mkString("\n").getBytes)
      Files.move(tmp, dir.resolve(name))
    }
    def rows(df: org.apache.spark.sql.DataFrame): Seq[String] =
      df.collect().map(r => s"""{"doc_id":${r.getLong(0)},"text":"${r.getString(1)}"}""").toSeq
    writeBatch("b1.json", rows(b1Docs))

    val streamPairs = scala.collection.mutable.Set[(Long, Long, Long)]()
    val q = spark.readStream.schema("doc_id LONG, text STRING").json(dir.toString)
      .writeStream
      .foreachBatch(StreamDedup.minhashStoreForeachBatch(storeA, 0.5) {
        (bid, pairs) =>
          streamPairs ++= pairs.select("new_id", "hist_id").collect()
            .map(r => (bid, r.getLong(0), r.getLong(1)))
          ()
      })
      .option("checkpointLocation", Files.createTempDirectory("mhs-ckpt").toString)
      .start()
    q.processAllAvailable()
    writeBatch("b2.json", rows(b2Docs))
    q.processAllAvailable()
    q.stop()

    // batch replica: probe then append, batch by batch
    def probePairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] = {
      val got = storeB.probeEstimate(df, 0.5).select("new_id", "hist_id")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      storeB.append(df)
      got
    }
    val batchPairs = probePairs(b1Docs).map(p => (0L, p._1, p._2)) ++
      probePairs(b2Docs).map(p => (1L, p._1, p._2))
    assert(streamPairs.toSet == batchPairs, s"stream $streamPairs vs batch $batchPairs")
    // the cross-batch catch is the point: 201 (batch 2) matched 103
    // (batch 1) through the store, beyond any in-memory bucket state
    assert(streamPairs.exists { case (_, n, h) => n == 201L && h == 103L },
      s"cross-batch near-dup missed: $streamPairs")
    assert(streamPairs.exists { case (_, n, h) => n == 101L && h == 2L })
    assert(!streamPairs.exists { case (_, n, _) => n == 202L })

    // replay idempotence: re-running batch 2's body (at-least-once
    // semantics) reports the SAME pairs — its own appended copy is
    // anti-joined out — and does not double-append
    val sizeBefore = storeA.signatures.count()
    var replay = Set.empty[(Long, Long)]
    StreamDedup.minhashStoreForeachBatch(storeA, 0.5) { (_, pairs) =>
      replay = pairs.select("new_id", "hist_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      ()
    }.apply(b2Docs, 1L)
    assert(replay == batchPairs.collect { case (1L, n, h) => (n, h) },
      s"replayed probe diverged: $replay")
    assert(storeA.signatures.count() == sizeBefore, "replay must not double-append")

    // the documented steady-state idiom: compact between micro-batches,
    // flip the Store pointer, keep streaming — the compacted generation
    // must still see every earlier batch AND keep the replay guard (the
    // high-water mark carries, so re-running batch 1 on the new store
    // still skips the duplicate append)
    val storeC = storeA.compactTo(
      Files.createTempDirectory("mhs-stream-gen1").toString, maxFilesPerBand = 0)
    assert(storeC.path != storeA.path, "maxFilesPerBand=0 must force a new generation")
    var afterFlip = Set.empty[(Long, Long)]
    val sizeC = storeC.signatures.count()
    StreamDedup.minhashStoreForeachBatch(storeC, 0.5) { (_, pairs) =>
      afterFlip = pairs.select("new_id", "hist_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      ()
    }.apply(b2Docs, 1L) // replay of batch 1 against the new generation
    assert(afterFlip == replay, s"compacted generation diverged: $afterFlip")
    assert(storeC.signatures.count() == sizeC,
      "high-water mark must carry through compaction: no duplicate append")
    // a genuinely new batch against the flipped store catches dups from
    // BOTH pre-compaction batches
    val b3Docs = Seq(
      (301L, "yet another document that matches nothing stored so far in any way")) // dup of 202 (batch 2)
      .toDF("doc_id", "text")
    var b3Pairs = Set.empty[(Long, Long)]
    StreamDedup.minhashStoreForeachBatch(storeC, 0.5) { (_, pairs) =>
      b3Pairs = pairs.select("new_id", "hist_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      ()
    }.apply(b3Docs, 2L)
    assert(b3Pairs == Set((301L, 202L)), s"post-flip cross-batch catch: $b3Pairs")
  }

  test("auto-compacting store sink: bounded files over a long run, pairs identical, restart resumes the live generation") {
    import graft.ml.MinHashStore
    import spark.implicits._
    def docText(k: Int) = s"unique document number $k with plenty of words " +
      "to shingle for the minhash signature pipeline across micro batches"
    // batch i: one exact dup of a doc from two batches back + two fresh
    def batchDocs(i: Int): org.apache.spark.sql.DataFrame = {
      val fresh = Seq((i * 10L + 1, docText(i * 10 + 1)), (i * 10L + 2, docText(i * 10 + 2)))
      val dup = if (i >= 2) Seq((i * 10L + 3, docText((i - 2) * 10 + 1))) else Nil
      (fresh ++ dup).toDF("doc_id", "text")
    }
    val hist = Seq((1000001L, "seed history document with enough words to shingle and signature"))
      .toDF("doc_id", "text")
    val origPath = Files.createTempDirectory("mhs-auto").resolve("store").toString
    val store = MinHashStore.build(hist, origPath)
    val twin = MinHashStore.build(hist, Files.createTempDirectory("mhs-auto-twin").toString)

    def pairSet(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.select("new_id", "hist_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val got = scala.collection.mutable.Map[Long, Set[(Long, Long)]]()
    val sink = StreamDedup.minhashStoreForeachBatch(store, 0.5,
      compactEvery = 4, maxFilesPerBand = 4) { (bid, pairs) =>
      got(bid) = pairSet(pairs); ()
    }
    val rounds = 16
    for (i <- 0 until rounds) {
      val docs = batchDocs(i)
      sink.apply(docs, i.toLong)
      // never-compacted replica: probe-then-append, the parity oracle
      val h = twin.probeEstimateHandle(docs, 0.5)
      try assert(got(i.toLong) == pairSet(h.pairs),
        s"batch $i diverged from the uncompacted twin") finally h.close()
      twin.append(docs)
    }
    assert((2 until rounds).forall(i =>
      got(i.toLong).contains((i * 10L + 3, (i - 2) * 10L + 1))),
      s"every cross-batch dup caught: $got")

    // the flip happened, is durable, and retired its intermediates
    val live = MinHashStore.resolveLive(store)
    assert(live.path != store.path, "auto-compaction never flipped")
    val parent = java.nio.file.Paths.get(origPath).getParent
    val gens = Files.list(parent).filter(
      _.getFileName.toString.startsWith("store@g")).count()
    assert(gens == 1, s"intermediate generations not retired: $gens")
    // bounded fragmentation: the live generation's band dirs never carry
    // more than one uncompacted cycle of appends
    val bandsDir = java.nio.file.Paths.get(live.path, "bands")
    val maxFiles = Files.list(bandsDir).filter(
      _.getFileName.toString.startsWith("band=")).mapToInt { d =>
      Files.list(d).filter(_.getFileName.toString.endsWith(".parquet"))
        .count().toInt
    }.max().orElse(0)
    assert(maxFiles <= 4 + 4, s"file count unbounded: $maxFiles per band")

    // restart: a NEW closure built from the ORIGINAL store resolves to
    // the live generation — replaying the last batch reports the same
    // pairs and appends nothing
    val sigsBefore = live.signatures.count()
    var replay = Set.empty[(Long, Long)]
    StreamDedup.minhashStoreForeachBatch(store, 0.5, compactEvery = 4,
      maxFilesPerBand = 4) { (_, pairs) => replay = pairSet(pairs); () }
      .apply(batchDocs(rounds - 1), (rounds - 1).toLong)
    assert(replay == got((rounds - 1).toLong), s"restart replay diverged: $replay")
    assert(MinHashStore.resolveLive(store).signatures.count() == sigsBefore,
      "restart replay must not re-append")
  }

  test("streaming dedup keeps first arrival across micro-batches") {
    val dir = Files.createTempDirectory("sdedup-src")
    def writeBatch(name: String, lines: Seq[String]): Unit = {
      val tmp = dir.resolve(s".$name"); Files.write(tmp, lines.mkString("\n").getBytes)
      Files.move(tmp, dir.resolve(name))
    }
    writeBatch("b1.json", Seq(
      """{"doc_id":1,"text":"alpha","ts":"2024-01-01T00:00:00Z"}""",
      """{"doc_id":2,"text":"alpha","ts":"2024-01-01T00:00:01Z"}""",
      """{"doc_id":3,"text":"beta","ts":"2024-01-01T00:00:02Z"}"""))

    val stream = spark.readStream
      .schema("doc_id LONG, text STRING, ts TIMESTAMP")
      .json(dir.toString)
    val q = WindowOps.dedupStream(stream, "ts", "10 minutes")
      .writeStream.outputMode("append").format("memory").queryName("sdedup_out")
      .start()
    q.processAllAvailable()
    // a later micro-batch re-sends "alpha" (within the watermark) + new doc
    writeBatch("b2.json", Seq(
      """{"doc_id":4,"text":"alpha","ts":"2024-01-01T00:00:03Z"}""",
      """{"doc_id":5,"text":"gamma","ts":"2024-01-01T00:00:04Z"}"""))
    q.processAllAvailable()
    q.stop()

    val kept = spark.sql("SELECT text FROM sdedup_out")
      .collect().map(_.getString(0)).sorted.toSeq
    assert(kept == Seq("alpha", "beta", "gamma"),
      s"each content survives exactly once, got $kept")
  }

  test("ops metrics: dedup bucket/candidate counters move, TTL expiry counted") {
    val base = "the quick brown fox jumps over the lazy dog and then runs far " +
      "away across the wide green field toward the old stone bridge by the river"
    val dir = Files.createTempDirectory("sminhash-metrics-src")
    def writeBatch(name: String, lines: Seq[String]): Unit = {
      val tmp = dir.resolve(s".$name"); Files.write(tmp, lines.mkString("\n").getBytes)
      Files.move(tmp, dir.resolve(name))
    }
    def rec(id: Long, text: String, ts: String) =
      s"""{"doc_id":$id,"text":"$text","ts":"$ts"}"""
    writeBatch("b1.json", Seq(rec(1, base, "2024-01-01T00:00:00Z")))

    val metrics = new StreamMetrics.DedupMetrics(spark)
    val stream = spark.readStream
      .schema("doc_id LONG, text STRING, ts TIMESTAMP")
      .json(dir.toString)
    val q = StreamDedup.minhashCandidates(stream, "ts", "1 second",
      ttlMs = 2000L, metrics = Some(metrics))
      .writeStream.outputMode("append").format("memory").queryName("sminhash_m_out")
      .start()
    try {
      q.processAllAvailable()
      val liveAfterFirst = metrics.bucketsLive.value
      assert(liveAfterFirst >= 1L, "doc 1 occupies its band buckets")
      assert(metrics.candidates.value == 0L)

      // an exact duplicate within the TTL: candidates fire
      writeBatch("b2.json", Seq(rec(2, base, "2024-01-01T00:00:01Z")))
      q.processAllAvailable()
      assert(metrics.candidates.value >= 1L, "duplicate produced candidates")

      // an event far past every deadline advances the watermark (timeouts
      // then fire in whatever batch — including a no-data batch — runs
      // against it) and reclaims doc 1/2's idle buckets; doc 4 duplicates
      // doc 3 exactly, so it claims no new buckets
      writeBatch("b3.json", Seq(rec(3, "totally unrelated words here",
        "2024-01-01T01:00:00Z")))
      q.processAllAvailable()
      writeBatch("b4.json", Seq(rec(4, "totally unrelated words here",
        "2024-01-01T01:00:01Z")))
      q.processAllAvailable()
      assert(metrics.bucketsExpired.value >= liveAfterFirst,
        s"doc 1/2's idle buckets reclaimed (expired=${metrics.bucketsExpired.value})")
      assert(metrics.bucketsLive.value ==
        metrics.bucketsCreated.value - metrics.bucketsExpired.value,
        s"net live gauge == created - expired " +
          s"(live=${metrics.bucketsLive.value} " +
          s"created=${metrics.bucketsCreated.value} " +
          s"expired=${metrics.bucketsExpired.value})")
      assert(metrics.bucketsLive.value >= 1L, "doc 3/4's buckets still live")
    } finally q.stop()
  }
}
