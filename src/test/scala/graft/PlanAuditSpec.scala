package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Plan-shape audit over the gate queries: the scale claims in SURVEY §8
  * as executable assertions, so a regression that silently de-optimizes a
  * plan (lost pushdown, accidental cartesian, sort-merge where a broadcast
  * belongs, single-partition global windows) fails CI rather than only
  * showing up at the next 100× data jump.
  */
class PlanAuditSpec extends AnyFunSuite {

  lazy val spark: SparkSession = GraftSession.local(8)
  val dir = "/root/testdata/sf0.001"

  private def execPlan(name: String) =
    Registry.byName(name).run(spark, dir).queryExecution.executedPlan

  private def planOf(name: String): String = execPlan(name).toString

  // AQE-descending traversal (see PlanTestUtil: a plain plan.collect on an
  // adaptive plan is vacuous)
  private def windowsIn(p: org.apache.spark.sql.execution.SparkPlan) =
    PlanTestUtil.windowsIn(p)

  test("no gate query plans a cartesian product or single-partition window") {
    Registry.all.foreach { q =>
      val exec = execPlan(q.name)
      val plan = exec.toString
      assert(!plan.contains("CartesianProduct"),
        s"${q.name} plans a cartesian product")
      // a window with an empty partition spec funnels the whole input
      // through one task — the q_pack prefix sum exists precisely to
      // avoid this; nothing in the inventory may reintroduce it.
      // An all-FOLDABLE spec is the same bottleneck after constant
      // folding (the ETL renumber's partitionBy(_outtopic) was exactly
      // this for single-output programs: _outtopic is lit(out) per rule),
      // so constants don't count as partitioning either.
      val globalWindows = windowsIn(exec).filter(_.partitionSpec.forall(_.foldable))
      assert(globalWindows.isEmpty,
        s"${q.name}: global (unpartitioned or constant-partitioned) window" +
          " — single-task bottleneck")
    }
  }

  test("filters and projections reach the parquet scans") {
    val scan = planOf("q_scan_filter")
    assert(scan.contains("PushedFilters: [IsNotNull"), scan.take(2000))
    // projection pruned to the selected + filtered columns only
    assert("ReadSchema: [^\n]*l_orderkey".r.findFirstIn(scan).isDefined)
    assert(!scan.contains("l_comment"), "unused column read from parquet")

    val cursor = planOf("q_range_cursor")
    assert(cursor.contains("PushedFilters") && cursor.contains("GreaterThan"),
      cursor.take(2000))
  }

  test("joins against small sides broadcast (no sort-merge, no shuffle of the dim)") {
    // q_etl_denorm is deliberately absent: its join pairs two halves of
    // the same CDC stream — both sides scale with the data, so broadcast
    // is only right when runtime stats (AQE) say one side stayed small
    Seq("q_inner_join", "q_anti_join", "q_semi_join").foreach { n =>
      val plan = planOf(n)
      assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastNestedLoopJoin"),
        s"$n: expected a broadcast join\n${plan.take(1500)}")
      assert(!plan.contains("SortMergeJoin"), s"$n: sort-merge join crept in")
    }
  }

  test("aggregations are two-phase (map-side partial before the shuffle)") {
    Seq("q_agg", "q_groupby_max", "q_corpus_stats", "q_ann_topk").foreach { n =>
      val plan = planOf(n)
      val partials = "partial".r.findAllIn(plan.toLowerCase).size
      assert(partials >= 1, s"$n: no partial aggregation phase\n${plan.take(1500)}")
    }
  }

  test("corpus-construction gates stay scan-speed / single-shuffle") {
    // AQE wraps the plan, so audit the rendered tree rather than collect()
    def exchanges(n: String): Int =
      "Exchange ".r.findAllIn(planOf(n)).size
    // repetition + mixture are pure per-row work: no exchange anywhere
    Seq("q_repetition", "q_mixture").foreach { n =>
      assert(exchanges(n) == 0,
        s"$n: expected a shuffle-free scan\n${planOf(n).take(1500)}")
    }
    // shuffle_order is exactly one hash exchange on the bounded shard key
    assert(exchanges("q_shuffle_order") == 1 &&
      planOf("q_shuffle_order").contains("Exchange hashpartitioning(shard"),
      s"q_shuffle_order: want exactly 1 shard-keyed exchange\n${planOf("q_shuffle_order").take(1500)}")
  }

  test("line/span dedup shuffle hashes, aggregate partially, and strip text") {
    Seq("q_line_dedup", "q_span_dedup").foreach { n =>
      val plan = planOf(n)
      // the df/survivor aggregate over line/span hashes must partial-agg
      // (heavy-hitter boilerplate combines map-side, never reaching the
      // shuffle un-combined)
      assert("partial".r.findAllIn(plan.toLowerCase).nonEmpty,
        s"$n: no partial aggregation before the hash shuffle")
      // the catalog join is an anti join on the 8-byte hash / (doc,pos)
      // key, not an inner join carrying text
      assert(plan.contains("LeftAnti"),
        s"$n: expected a left_anti against the dedup catalog")
      assert(!plan.contains("CartesianProduct"), s"$n: cartesian")
    }
    // span dedup's survivor aggregate groups the 8-byte xxhash64, so the
    // wide span strings never enter that exchange
    val span = planOf("q_span_dedup")
    assert("hashpartitioning\\(h#".r.findFirstIn(span).isDefined,
      s"q_span_dedup: survivor aggregate should shuffle on the span hash\n${span.take(1500)}")
    // the document tokenize must appear exactly where it's computed once
    // per INPUT row (the token-stream generator and the n_total
    // projection) — an occurrence downstream of the span explode means
    // CollapseProject inlined it to run once per SPAN row (measured 300+
    // CPU-min at sf10 when the width column referenced tokens(text))
    val tokenizes = "\\btokens\\(".r.findAllIn(span).length
    assert(tokenizes <= 2,
      s"q_span_dedup: document tokenize appears $tokenizes times — recomputed past the explode")
  }

  test("LSH candidate generation shuffles only narrow band keys") {
    val plan = planOf("q_dedup_minhash")
    // the exploded band join must not carry the shingle arrays; the
    // persisted signature base is re-joined only for verification
    assert(plan.contains("InMemoryTableScan"),
      "signature base should come from the persisted cache")
  }

  test("repetition gate materializes the word array once") {
    // the split-expression must live in ONE projection and be referenced
    // as an attribute by the higher-order lambdas: inlined (collapsed)
    // copies re-split the text per array element when interpreted —
    // measured 162 CPU-minutes at sf10 vs 6.5 after the projection
    val plan = planOf("q_repetition")
    val occurrences = "split\\(".r.findAllIn(plan).length
    assert(occurrences <= 2,
      s"expected one materialized split projection, found $occurrences in plan")
  }

  test("bloom dedup probes via a scalar-subquery constant, not a join") {
    // history must reach the probe scan as a broadcastable Bloom filter
    // (scalar subquery — the same node Spark's runtime-filter rewrite
    // injects), never as a row-joined attribute
    val plan = planOf("q_dedup_bloom")
    assert(plan.contains("might_contain"),
      s"expected a bloom probe in the plan\n${plan.take(1200)}")
    assert(plan.contains("Subquery") || plan.contains("scalar-subquery"),
      "bloom filter should arrive via a scalar subquery")
  }

  test("shingle-bearing gates use the native one-pass expression") {
    // the composed shingles(tokens(text)) chain is CodegenFallback and
    // re-evaluates the tokenizer once per shingle when interpreted —
    // O(tokens²) per document, the bug the sf10 ladder caught live on
    // q_contamination. The gates must carry ShinglesExpr instead.
    Seq("q_contamination", "q_ngram_jaccard").foreach { n =>
      val plan = planOf(n)
      assert(plan.contains("shingles_text"),
        s"$n: expected the native shingles_text expression\n${plan.take(1200)}")
      assert(!plan.contains("array_join(slice("),
        s"$n: composed slice/array_join shingle chain crept back in")
    }
  }

  test("blocked all-pairs stages pin salted parallelism explicitly") {
    // saltedBlockPairs must repartition by an explicit COUNT: under a
    // broadcast plan there is no shuffle, so without it the quadratic
    // pair stream would run at input-file parallelism (one task on a
    // compact single-file table) no matter how the salt distributes
    Seq("q_ngram_jaccard", "q_dedup_embed").foreach { n =>
      val plan = planOf(n)
      assert(plan.contains("REPARTITION_BY_NUM"),
        s"$n: expected an explicit-count salted repartition\n${plan.take(1500)}")
      assert(plan.contains("_salt"),
        s"$n: salt column missing from the pair-generation shuffle")
    }
  }

  test("ETL renumber stays codegen-stable at cluster-scale shuffle partitions") {
    // The per-(topic, bucket) offset base must arrive via a broadcast
    // dimension join, NOT a compiled when-chain: a chain is O(buckets)
    // deep and at cluster-scale partition counts (2000+) blows Janino's
    // 64 KB method cap, knocking the renumber projection out of
    // whole-stage codegen exactly when the batch is big enough to care.
    // (The ETL gates checkpoint their result, so audit the raw program
    // plan here, pre-checkpoint.)
    import org.apache.spark.sql.functions._
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "2000")
    try {
      val yaml =
        """inputs:
          |  - topic: purchase
          |    pool: Raw
          |output:
          |  topic: Out
          |  pool: Staging
          |transforms:
          |  - type: stateless
          |    in: purchase
          |    out: Out
          |    zed: |
          |      | out:={ key: in.key, value: { amount: in.value.v } }
          |""".stripMargin
      val program = graft.etl.Compiler.compile(graft.etl.Transform.fromYaml(yaml))
      val input = spark.range(0, 100000).select(
        struct(lit("purchase").as("topic"), col("id").as("offset")).as("kafka"),
        struct(col("id").cast("string").as("user")).as("key"),
        struct((col("id") % 1000).as("v")).as("value"))
      val doneSet = spark.range(0).select(
        lit("x").as("topic"), col("id").as("offset"))
      val out = program.run(input, doneSet, Map("Out" -> 0L))
      out.collect() // drive, so AQE finalizes the plan
      val plan = out.queryExecution.executedPlan.toString
      assert(plan.contains("isFinalPlan=true"), plan.take(300))
      assert(plan.contains("BroadcastHashJoin"),
        s"bucket-base should broadcast-join, not compile into the projection\n${plan.take(2000)}")
      // no O(buckets) expression anywhere: with 2000 buckets a when-chain
      // or indicator-sum would print thousands of CASE WHEN terms
      val caseWhens = "CASE WHEN".r.findAllIn(plan).size
      assert(caseWhens < 50, s"found $caseWhens CASE WHEN terms — bucket-" +
        "count-proportional expression crept back into the renumber")
      // the renumber projection (row_number − 1 + broadcast bucket base;
      // `_newoff` itself collapses into the kafka-struct build) must sit
      // inside a whole-stage-codegen span
      val renumLines = plan.linesIterator.filter(l =>
        l.contains("coalesce(_bb_base") && l.contains("Project")).toSeq
      assert(renumLines.nonEmpty, s"renumber projection missing from plan\n${plan.take(2000)}")
      assert(renumLines.exists(_.contains("*(")),
        s"renumber projection left whole-stage codegen:\n${renumLines.mkString("\n")}")
    } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
  }

  test("ETL renumber stays parallel on narrow high-offset incremental batches") {
    // The octave bucket scheme spreads keys whose span is proportional to
    // their magnitude: a steady-state incremental batch whose offsets sit
    // in a narrow HIGH range (cursor-pruned, e.g. [1e9, 1e9+1e5)) lands in
    // 1-2 buckets — the renumber window would run on a single task.
    // Pipeline passes its contiguity-base min as an anchor; a constant
    // shift restores near-zero-based spread and cannot change results.
    import org.apache.spark.sql.functions._
    import graft.functions.OffsetBucketExpr.offsetBucketNative
    val base = 1000000000L
    val n = 100000L
    val unanchored = spark.range(base, base + n)
      .select(offsetBucketNative(col("id"), 7).as("b"))
      .distinct().count()
    assert(unanchored <= 2, s"expected bucket collapse unanchored, got $unanchored")
    val anchored = spark.range(base, base + n)
      .select(offsetBucketNative(col("id") - base, 7).as("b"))
      .distinct().count()
    assert(anchored >= 64, s"anchored spread too narrow: $anchored buckets")

    // end-to-end: anchor affects only parallelism, never the assignment
    val yaml =
      """inputs:
        |  - topic: purchase
        |    pool: Raw
        |output:
        |  topic: Out
        |  pool: Staging
        |transforms:
        |  - type: stateless
        |    in: purchase
        |    out: Out
        |    zed: |
        |      | out:={ key: in.key, value: { amount: in.value.v } }
        |""".stripMargin
    val program = graft.etl.Compiler.compile(graft.etl.Transform.fromYaml(yaml))
    val input = spark.range(base, base + 5000).select(
      struct(lit("purchase").as("topic"), col("id").as("offset")).as("kafka"),
      struct(col("id").cast("string").as("user")).as("key"),
      struct((col("id") % 1000).as("v")).as("value"))
    val doneSet = spark.range(0).select(lit("x").as("topic"), col("id").as("offset"))
    def rows(anchor: Long) =
      program.run(input, doneSet, Map("Out" -> 7L), identity, anchor)
        .orderBy(col("kafka.offset"), col("_type"))
        .collect().map(_.toString).toSeq
    assert(rows(base) == rows(0L))
  }

  test("ANN shortlists run on bounded heaps: no rank window anywhere in the plans") {
    // r12 verdict #2: sqTopK/ivfPqTopK shortlisted through a per-query
    // global-sort window — one task sorting the corpus per query. The
    // shortlist, probe, argmax-assign and re-rank all moved to the
    // bounded-heap aggregate; NO WindowExec of any kind may reappear in
    // any ANN gate's executed plan.
    Seq("q_ann_sq", "q_ann_ivfpq", "q_ann_ivf", "q_ann_pq", "q_ann_topk",
      "q_ann_batch", "q_ann_lsh").foreach { g =>
      val wins = windowsIn(execPlan(g))
      assert(wins.isEmpty, s"$g plans ${wins.size} rank window(s); " +
        "the bounded k-heap (topk_pairs) must carry every ANN ranking")
    }
  }

  test("q_sample's stratified rank parallelizes WITHIN a language") {
    // r13 verdict #2: a rank window partitioned on lang alone funnels each
    // language through one task — a dominant language is most of a 100 TB
    // corpus. The two-phase bucketed rank partitions every DATA window on
    // (lang, bucket); no single-column partition spec may reappear over
    // data rows. Windows over AGGREGATE output (the r17 in-plan bases:
    // per-(lang, bucket) counts, ≤ 256 rows per language by construction)
    // are exempt — their per-key row count is bounded by the bucket
    // fan-out, not the corpus — but must still sit strictly above an
    // Aggregate so a data-row window can never slip through this test.
    val wins = windowsIn(execPlan("q_sample"))
    assert(wins.nonEmpty, "q_sample should rank through a (lang,bucket) window")
    // The exemption walks the window's DIRECT input path (r17 advice): a
    // subtree-wide collectFirst would exempt a data-row window sitting
    // above e.g. a join one of whose sides aggregates. Only nodes that
    // cannot MULTIPLY per-key rows may stand between the window and the
    // aggregate whose bounded output it ranks: project/filter/sort/
    // exchange and the AQE/codegen wrappers — never a join, generate,
    // expand, or a raw scan.
    def aggOnDirectInput(p: org.apache.spark.sql.execution.SparkPlan): Boolean = {
      import org.apache.spark.sql.execution._
      p match {
        case _: aggregate.BaseAggregateExec => true
        case q: adaptive.QueryStageExec => aggOnDirectInput(q.plan)
        case a: adaptive.AdaptiveSparkPlanExec => aggOnDirectInput(a.executedPlan)
        case _: GenerateExec | _: ExpandExec => false
        case w: WholeStageCodegenExec => aggOnDirectInput(w.child)
        case i: InputAdapter => aggOnDirectInput(i.child)
        case u: UnaryExecNode
          if u.isInstanceOf[ProjectExec] || u.isInstanceOf[FilterExec] ||
            u.isInstanceOf[SortExec] || u.isInstanceOf[CoalesceExec] ||
            u.isInstanceOf[exchange.ShuffleExchangeLike] ||
            u.isInstanceOf[adaptive.AQEShuffleReadExec] ||
            // another window below preserves row count 1:1 (the stacked
            // in-plan bases windows), so it cannot turn bounded aggregate
            // output back into corpus-scale rows
            u.isInstanceOf[window.WindowExec] =>
          aggOnDirectInput(u.child)
        case r: exchange.ReusedExchangeExec => aggOnDirectInput(r.child)
        case _ => false
      }
    }
    assert(wins.exists(_.partitionSpec.length >= 2),
      "q_sample lost its (lang,bucket) data rank window")
    wins.filter(_.partitionSpec.length < 2).foreach { w =>
      assert(w.children.forall(aggOnDirectInput),
        s"q_sample window partitions on ${w.partitionSpec} over DATA rows " +
          "— one task per language")
    }
  }

  test("persisted-index searches (IvfIndex, IvfPq) run on bounded heaps too") {
    // r13 verdict #1: the disk-backed index APIs — the search paths a
    // 100 TB deployment actually calls — still shortlisted through
    // per-query rank windows after the gate plans moved to the k-heap.
    // Probe, ADC shortlist, and re-rank must all ride topk_pairs; no
    // WindowExec may appear anywhere in either executed search plan.
    import org.apache.spark.sql.functions.col
    val corpus = graft.sources.Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val queries = corpus.filter(col("vec_id") < 3)
    def windows(df: org.apache.spark.sql.DataFrame) =
      windowsIn(df.queryExecution.executedPlan)
    val ivfPath = java.nio.file.Files.createTempDirectory("audit-ivf").toString
    val ivf = graft.ml.IvfIndex.build(corpus, ivfPath, cells = 5, trainIters = 1)
    assert(windows(ivf.search(queries, 5, nprobe = 2)).isEmpty,
      "IvfIndex.search plans a rank window")
    val pqPath = java.nio.file.Files.createTempDirectory("audit-ivfpq").toString
    val ivfpq = graft.ml.IvfPq.build(corpus, pqPath, cells = 5, m = 8, k = 16, iters = 1)
    assert(windows(ivfpq.search(corpus, queries, 5, nprobe = 2, shortlist = 20)).isEmpty,
      "IvfPqIndex.search plans a rank window")
  }

  test("disk-index search plans construct with ZERO jobs and prune cells dynamically") {
    // r14 verdict #3: probedScan ran a distinct().collect() cell-list job
    // before the plan existed. The probed-cell universe now comes from a
    // driver-side dir listing (zero jobs), and the file pruning moved to
    // a DynamicPruning filter on the partitioned cells/ scan — reusing
    // the probe broadcast — so CONSTRUCTING either search must launch no
    // Spark job, and the EXECUTED plan must still show runtime cell
    // pruning (not a full-universe scan).
    import org.apache.spark.sql.functions.col
    val corpus = graft.sources.Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val queries = corpus.filter(col("vec_id") < 3)
    val ivf = graft.ml.IvfIndex.build(corpus,
      java.nio.file.Files.createTempDirectory("audit-ivf-dpp").toString,
      cells = 5, trainIters = 1)
    val ivfpq = graft.ml.IvfPq.build(corpus,
      java.nio.file.Files.createTempDirectory("audit-ivfpq-dpp").toString,
      cells = 5, m = 8, k = 16, iters = 1)
    @volatile var jobs = 0
    val l = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = jobs += 1
    }
    spark.sparkContext.addSparkListener(l)
    try {
      val one = queries.filter(col("vec_id") < 1) // 1 query × nprobe 2 < 5 cells
      val a = ivf.search(one, 5, nprobe = 2)
      val b = ivfpq.search(corpus, one, 5, nprobe = 2, shortlist = 20)
      a.queryExecution.logical
      b.queryExecution.logical
      org.apache.spark.sql.graftbridge.Bridge.waitListenerBusEmpty(spark)
      assert(jobs == 0, s"disk-index search construction launched $jobs Spark job(s)")
      for ((name, df) <- Seq("IvfIndex.search" -> a, "IvfPqIndex.search" -> b)) {
        assert(df.count() > 0, s"$name returned no rows")
        // the filter must be a LIVE pruning subquery — when AQE cannot
        // reuse the cell join's broadcast it silently degrades the filter
        // to dynamicpruningexpression(true), which still pattern-matches
        // DynamicPruning but prunes nothing (the r15 IvfPq composite-build
        // lesson); so also require the executed partitions-read metric to
        // be under the 5-cell universe (1 query × nprobe 2 → ≤ 2)
        val dppScans = PlanTestUtil.allNodes(df.queryExecution.executedPlan).collect {
          case s: org.apache.spark.sql.execution.FileSourceScanExec
              if s.partitionFilters.exists(_.exists {
                case d: org.apache.spark.sql.catalyst.expressions.DynamicPruningExpression =>
                  !d.child.isInstanceOf[org.apache.spark.sql.catalyst.expressions.Literal]
                case _ => false
              }) => s
        }
        assert(dppScans.nonEmpty,
          s"$name: no live DynamicPruning subquery on the cells/ scan")
        val partsRead = dppScans.map(_.metrics("numPartitions").value).max
        assert(partsRead <= 2,
          s"$name: DPP read $partsRead cell partitions for a 1-query nprobe=2 probe")
      }
    } finally spark.sparkContext.removeSparkListener(l)
  }

  test("SQ8 search builds with ZERO driver-side jobs (shortlist sized in-plan)") {
    // r12 verdict #3: sqTopK ran corpus.count() before the plan existed.
    // The bound now rides the stats row into topk_pairs' dynamic k, so
    // CONSTRUCTING the search plan must launch no Spark job at all.
    val corpus = graft.sources.Tables.embeddings(spark, dir)
      .select(org.apache.spark.sql.functions.col("vec_id"),
        org.apache.spark.sql.functions.col("embedding").cast("array<double>").as("v"))
    val queries = corpus.filter(org.apache.spark.sql.functions.col("vec_id") < 5)
    @volatile var jobs = 0
    val l = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = jobs += 1
    }
    spark.sparkContext.addSparkListener(l)
    try {
      val df = graft.ml.AnnOps.sqTopK(corpus, queries, 5)
      df.queryExecution.logical // force construction end-to-end
      // drain the async listener bus (not a fixed sleep — a loaded box can
      // deliver a late job-start event after the assert and false-pass)
      org.apache.spark.sql.graftbridge.Bridge.waitListenerBusEmpty(spark)
      assert(jobs == 0, s"sqTopK plan construction launched $jobs Spark job(s)")
      assert(df.count() > 0) // and the plan still runs
    } finally spark.sparkContext.removeSparkListener(l)
  }

  test("native per-row expressions run inside whole-stage codegen") {
    // CosineExpr has doGenCode: the projection evaluating it must carry a
    // codegen span marker (`*(n)`), not fall back to interpreted eval.
    // The HOF formulation this replaced was CodegenFallback — a silent
    // regression here would put interpretation back on the quadratic path.
    // AQE only inserts WholeStageCodegen per stage at execution, so drive
    // the query before rendering the (now final) plan.
    val df = Registry.byName("q_dedup_embed").run(spark, dir)
    df.collect() // count() would plan a different query; drive THIS plan
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("isFinalPlan=true"), plan.take(300))
    val cosineLines = plan.linesIterator.filter(_.contains("cosine_sim")).toSeq
    assert(cosineLines.nonEmpty, "q_dedup_embed should evaluate cosine_sim")
    assert(cosineLines.exists(_.contains("*(")),
      s"cosine_sim left whole-stage codegen:\n${cosineLines.mkString("\n")}")
  }
}
