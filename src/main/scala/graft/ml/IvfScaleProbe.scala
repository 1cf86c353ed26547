package graft.ml

import graft.sources.Tables
import org.apache.spark.sql.functions._

/** Dev tool: scale evidence for the PERSISTED-index search paths
  * (`IvfIndex.search`, `IvfPqIndex.search`) — the APIs a production
  * deployment calls, rewritten in r14 onto the bounded k-heap. Builds
  * both indexes over an sf dir's embeddings in a temp dir, then prints:
  *
  *  - probe recall@5 vs exact brute force over a deterministic query
  *    sample (the same bar DedupSpec pins at sf0.001);
  *  - the window count in each executed search plan (must be 0 — the
  *    per-query rank-window shape this rewrite removed);
  *  - the EXECUTED pruning ratio: cell partitions / files actually read
  *    by the DynamicPruning cells scan vs the stored totals (r15: the
  *    static IN-literal prune became a runtime DPP filter so plan
  *    construction is job-free; the evidence moved from plan text to
  *    scan metrics — expected ratio ≈ union-of-probed-cells / cells);
  *  - broadcast-vs-distributed search parity (searchDistributed is the
  *    bulk-batch path; its rows must equal the broadcast path's).
  *
  * env GRAFT_IVF_BULK=N — additionally time broadcast `search` vs
  * `searchDistributed` on an N-query batch ([[AnnOps.batchQueries]]-style
  * amplification of the corpus head) against the built IVF index: the
  * wall-clock side of the bulk contract (the structural side — no
  * query-derived broadcast — is DistributedQuerySpec-pinned).
  *
  * usage: run_main.sh graft.ml.IvfScaleProbe [sfDir] [cells] [nprobe]
  */
object IvfScaleProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/repo/testdata-sf1")
    val cells = if (args.length > 1) args(1).toInt else 64
    val nprobe = if (args.length > 2) args(2).toInt else 8
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = graft.GraftSession.builder(s"local[$cpus]", cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val corpus = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val n = corpus.count()
    val queries = corpus.filter(col("vec_id") < 20)
    def windows(df: org.apache.spark.sql.DataFrame): Int = {
      def walk(p: org.apache.spark.sql.execution.SparkPlan): Seq[org.apache.spark.sql.execution.SparkPlan] = {
        val kids = p match {
          case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec => Seq(a.executedPlan)
          case q: org.apache.spark.sql.execution.adaptive.QueryStageExec => Seq(q.plan)
          case o => o.children
        }
        p +: kids.flatMap(walk)
      }
      walk(df.queryExecution.executedPlan).count(
        _.isInstanceOf[org.apache.spark.sql.execution.window.WindowExec])
    }
    def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.select("q_id", "n_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val brute = pairs(AnnOps.bruteForceTopK(corpus, queries, 5))

    // executed pruning evidence: partitions/files the DPP cells scan read
    def walkPlan(p: org.apache.spark.sql.execution.SparkPlan): Seq[org.apache.spark.sql.execution.SparkPlan] = {
      val kids = p match {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec => Seq(a.executedPlan)
        case q: org.apache.spark.sql.execution.adaptive.QueryStageExec => Seq(q.plan)
        case o => o.children
      }
      p +: kids.flatMap(walkPlan)
    }
    // NOTE: metrics populate on the EXECUTED query execution — the frame
    // itself must be collected (a derived .select().collect() plans a new
    // query and leaves these at zero)
    def dppScanMetrics(df: org.apache.spark.sql.DataFrame): Option[(Long, Long)] =
      walkPlan(df.queryExecution.executedPlan).collectFirst {
        case s: org.apache.spark.sql.execution.FileSourceScanExec
            if s.partitionFilters.exists(_.exists(
              _.isInstanceOf[org.apache.spark.sql.catalyst.expressions.DynamicPruning])) =>
          (s.metrics("numPartitions").value, s.metrics("numFiles").value)
      }
    def countFiles(p: String): Long = {
      val d = new java.io.File(p)
      if (!d.isDirectory) 0L
      else d.listFiles.map(f =>
        if (f.isDirectory) f.listFiles.count(_.getName.endsWith(".parquet")).toLong
        else if (f.getName.endsWith(".parquet")) 1L else 0L).sum
    }

    val base = java.nio.file.Files.createTempDirectory("ivfscale").toString
    val t0 = System.nanoTime()
    val ivf = IvfIndex.build(corpus, s"$base/ivf", cells = cells, trainIters = 2)
    val tBuild = (System.nanoTime() - t0) / 1e9
    val (probed, _) = ivf.probedScan(queries, nprobe)
    val sr = ivf.search(queries, 5, nprobe)
    val srRows = sr.collect()
    val got = srRows.map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (brute & got).size.toDouble / brute.size
    // the 20-query recall set probes most cells by union (1-(1-p)^20), so
    // per-query pruning evidence comes from a 2-query search: cells read
    // should be ≤ 2×nprobe of the universe
    val narrow = ivf.search(corpus.filter(col("vec_id") < 2), 5, nprobe)
    narrow.collect()
    val (cellsRead, filesRead) = dppScanMetrics(narrow).getOrElse((-1L, -1L))
    val filesTotal = countFiles(s"$base/ivf/cells")
    val distRows = pairs(ivf.searchDistributed(queries, 5, nprobe))
    println(f"IVF_SCALE dir=$sfDir n=$n cells=$cells nprobe=$nprobe " +
      f"build=${tBuild}%.1fs recall=$recall%.3f windows=${windows(sr)} " +
      s"cells_read_2q=$cellsRead/$cells files_read_2q=$filesRead/$filesTotal " +
      s"dist_equal=${distRows == got} probe_rows=${probed.count()}")

    // bulk wall-clock A/B: same index, an amplified query batch, both
    // join strategies timed twice (second reading is the JIT-warm one)
    sys.env.get("GRAFT_IVF_BULK").map(_.toInt).foreach { bq =>
      // clamp to the corpus: vec_ids are dense from 0, so the filter
      // yields min(requested, n) base rows — log the TRUE batch size or
      // per-query numbers derived from these lines are off
      val baseQ = math.min(math.max(1, bq / 20), n)
      val bulk = corpus.filter(col("vec_id") < baseQ)
        .withColumn("j", explode(sequence(lit(0L), lit(19L))))
        .select((col("vec_id") * 20 + col("j") + 1000000000L).as("vec_id"),
          transform(col("v"), (x, i) =>
            x + (((col("j") * 7 + i * 3) % 11) - 5) * lit(0.05)).as("v"))
      def time(label: String, f: => Long): Unit = {
        for (r <- 1 to 2) {
          val t = System.nanoTime(); val rows = f
          println(f"IVF_BULK $label run$r dir=$sfDir queries=${baseQ * 20} " +
            f"rows=$rows wall=${(System.nanoTime() - t) / 1e9}%.1fs")
        }
      }
      time("broadcast", ivf.search(bulk, 5, nprobe).count())
      time("distributed", ivf.searchDistributed(bulk, 5, nprobe).count())
    }

    val t1 = System.nanoTime()
    val ivfpq = IvfPq.build(corpus, s"$base/ivfpq", cells = cells, m = 8, k = 64, iters = 2)
    val tBuild2 = (System.nanoTime() - t1) / 1e9
    val sr2 = ivfpq.search(corpus, queries, 5, nprobe = nprobe, shortlist = 200)
    val sr2Rows = sr2.collect()
    val got2 = sr2Rows.map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall2 = (brute & got2).size.toDouble / brute.size
    // the DEFAULT search path (shortlist unset → footer-sized 5% corpus
    // fraction, zero pre-plan jobs) — since r16 this IS what a bare
    // search() runs; the fixed-200 number above shows the decay the
    // default exists to avoid
    val sr3 = ivfpq.search(corpus, queries, 5, nprobe = nprobe)
    val recall3 = (brute & pairs(sr3)).size.toDouble / brute.size
    val narrow2 = ivfpq.search(corpus, corpus.filter(col("vec_id") < 2), 5,
      nprobe = nprobe, shortlist = 200)
    narrow2.collect()
    val (cellsRead2, filesRead2) = dppScanMetrics(narrow2).getOrElse((-1L, -1L))
    val filesTotal2 = countFiles(s"$base/ivfpq/cells")
    val distEq2 = pairs(ivfpq.searchDistributed(corpus, queries, 5,
      nprobe = nprobe, shortlist = 200)) == got2
    println(f"IVFPQ_SCALE dir=$sfDir n=$n cells=$cells nprobe=$nprobe " +
      f"build=${tBuild2}%.1fs recall_fixed200=$recall2%.3f " +
      f"recall_default_frac5pct=$recall3%.3f windows=${windows(sr2)} " +
      s"cells_read_2q=$cellsRead2/$cells files_read_2q=$filesRead2/$filesTotal2 " +
      s"dist_equal=$distEq2")
    spark.stop()
  }
}
