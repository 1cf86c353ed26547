package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: times the headline queries on SPARK_GRAFT_SF_DIR and
  * prints one JSON line (driver contract).
  *
  * The DEFAULT (driver-run, no args) protocol is family isolation: a
  * fresh JVM per query family, so each family measures its plans instead
  * of the marathon JVM's accumulated heap/spill/JIT state (r13: a dedup
  * gate inflated 2× on identical code purely from suite ordering).
  * Within each family the suite is run `GRAFT_BENCH_RUNS` times (default
  * 5) after one untimed warm-up pass (JIT + parquet footer cache); the
  * reported per-query number is the MEDIAN across runs and `value` is
  * the sum of medians, so a single noisy run (GC pause, co-tenant load)
  * can no longer ship as the round's number. `spread` records min/max of
  * the per-run totals (summed per-family for the default mode).
  * `-marathon` keeps the old single-JVM suite for cross-validation.
  *
  * `-ladder` mode sweeps every scale rung present on this box (the
  * driver's /root/testdata/sf* plus locally generated testdata-sf*) with
  * the same median-of-n discipline and emits one JSON line per rung plus
  * the markdown scaling table BENCHNOTES records — so the cross-sf table
  * is produced by one command instead of hand-assembled per-round runs.
  */
object Bench {
  private def median(xs: Seq[Double]): Double = {
    val s = xs.sorted
    val n = s.length
    if (n % 2 == 1) s(n / 2) else (s(n / 2 - 1) + s(n / 2)) / 2.0
  }

  /** JSON string escape for query names — a name with a quote or
    * backslash must not produce an invalid JSON line.
    */
  private def jstr(s: String): String =
    "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"") + "\""

  /** Locale-independent %.3f: every machine-readable line (the JSON
    * artifact, the BENCHQ/BENCHSPREAD child protocol) must print '.'
    * decimals even on a comma-locale JVM — the parent parses them back
    * with .toDouble.
    */
  private def fmt3(x: Double): String =
    String.format(java.util.Locale.ROOT, "%.3f", Double.box(x))

  /** Deterministic CPU-bound calibration workload (r15 verdict #1): a
    * SplitMix64 fill + sort of a 32 MB long array plus a serial mixing
    * loop — no Spark, no I/O, no allocation churn beyond the one array —
    * so its wall time moves with the BOX (co-tenant load, thermal state,
    * frequency scaling), never with this repo's code. One reading is
    * taken per family child right before its timed suite; the artifact
    * carries the run's median and `box_drift` = calibration / the
    * ledger's best calibration, and regression flags are judged on the
    * drift-NORMALIZED ratio — a drifted box inflates gates and
    * calibration alike, so ambient noise can no longer masquerade as
    * nine regressions (the BENCH_r15 episode), while a real single-gate
    * slowdown leaves the calibration untouched and still flags.
    */
  private[graft] def calibrate(): Double = {
    val t0 = System.nanoTime()
    val arr = new Array[Long](1 << 22)
    var x = 0x9E3779B97F4A7C15L
    var i = 0
    while (i < arr.length) {
      x += 0x9E3779B97F4A7C15L
      var z = x
      z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
      z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
      arr(i) = z ^ (z >>> 31)
      i += 1
    }
    java.util.Arrays.sort(arr)
    var acc = arr(0) ^ arr(arr.length - 1) ^ arr(arr.length / 2)
    var j = 0
    while (j < (1 << 24)) { acc = (acc ^ (acc << 13)) * 0x2545F4914F6CDD1DL + j; j += 1 }
    // data-dependent sink so neither loop can be dead-code-eliminated
    if (acc == 42L) System.err.println("[bench] calibration sentinel")
    (System.nanoTime() - t0) / 1e9
  }

  /** Two calibration passes, minimum kept: the MIN is "how fast this box
    * can go" — load only ever inflates a reading, so min is the honest
    * per-process statistic; the parent medians across family children.
    */
  private[graft] def calibrateMin(): Double = math.min(calibrate(), calibrate())

  /** One warm-up pass then `runs` timed passes over the headline suite;
    * returns (per-query medians in suite order — None when a query never
    * succeeded, per-run totals over SUCCESSFUL samples only, failed query
    * names). A failed run contributes NO sample: its fast-fail elapsed
    * time would otherwise pull the median (and the headline total) BELOW
    * a healthy rung's, making a broken query read as a fast one.
    */
  private def runSuite(spark: SparkSession, sfDir: String, runs: Int,
      only: Option[Set[String]] = None): (Seq[(String, Option[Double])], Seq[Double], Set[String]) = {
    val headline = Registry.all.filter(_.headline)
      .filter(q => only.forall(_.contains(q.name)))
    headline.foreach(q => try q.run(spark, sfDir).count()
      catch { case _: Throwable => () })
    val failed = scala.collection.mutable.Set[String]()
    val samples: Seq[Seq[(String, Double)]] = (1 to runs).map { _ =>
      // drop cache blocks accumulated by gate-internal persists (minhash/
      // simhash signature bases etc.) between passes: without this, later
      // queries in a pass measure the marathon JVM's eviction/GC state
      // rather than their plans, and a pass could silently reuse the
      // previous pass's persisted intermediates
      spark.sharedState.cacheManager.clearCache()
      headline.flatMap { q =>
        val t0 = System.nanoTime()
        try {
          q.run(spark, sfDir).count()
          Some(q.name -> (System.nanoTime() - t0) / 1e9)
        } catch { case e: Throwable =>
          failed += q.name
          System.err.println(s"[bench] ${q.name} failed: ${e.getMessage}")
          None
        }
      }
    }
    val perQuery = headline.map { q =>
      val ok = samples.flatMap(_.find(_._1 == q.name).map(_._2))
      q.name -> (if (ok.isEmpty) None else Some(median(ok)))
    }
    (perQuery, samples.map(_.map(_._2).sum), failed.toSet)
  }

  /** CONFIRMED best over one gate's recorded readings (r16 verdict #2):
    * the minimum only gates when a second reading sits within 5% above
    * it; otherwise the second-lowest reading is the best. A single
    * exceptionally quiet reading must not become a bar every honest run
    * fails — q_ann_lsh's one-off 0.229 flagged 6 of 7 calibrated r16
    * readings (0.28–0.34, box_drift ≤ 1.08) as "regressions" on
    * unchanged code. The second-lowest is always attested (the lowest
    * itself sits within 5% BELOW it or further — either way, two
    * independent runs reached it), so the rule needs no recursion.
    */
  private[graft] def confirmedBest(readings: Seq[Double]): Option[Double] = {
    val s = readings.filter(_ > 0).sorted
    s match {
      case Seq() => None
      case Seq(one) => Some(one)
      case _ => Some(if (s(1) <= s(0) * 1.05) s(0) else s(1))
    }
  }

  /** The per-gate best-ever SAME-PROTOCOL ledger (r14 verdict #1): reads
    * `BENCH_BEST.json` (or `GRAFT_BENCH_BEST`) — maintained by
    * `tools/update_bench_best.py` from official families-mode artifacts —
    * and returns its per-gate best seconds, but ONLY when the ledger's sf
    * tag matches the run's sf dir (a sf0.01 smoke run compared against
    * sf0.1 bests would flag everything). When the ledger carries per-gate
    * `readings` arrays (r16 verdict #2), the effective best is computed
    * HERE via [[confirmedBest]] — the rule lives in the artifact's
    * consumer so BenchLedgerSpec pins it — and the ledger's `best` map
    * only covers gates with no recorded readings. The file is this repo's
    * own trivially regular format; the extraction is a line regex, not a
    * JSON parser dependency (readings arrays are the only q_-keyed arrays
    * in the file, so the two regexes cannot cross-match).
    */
  private[graft] def loadBest(sfDir: String): Map[String, Double] =
    try {
      val p = java.nio.file.Paths.get(
        sys.env.getOrElse("GRAFT_BENCH_BEST", "BENCH_BEST.json"))
      if (!java.nio.file.Files.isReadable(p)) Map.empty
      else {
        val s = new String(java.nio.file.Files.readAllBytes(p), "UTF-8")
        val sfTag = """"sf"\s*:\s*"([^"]*)"""".r.findFirstMatchIn(s).map(_.group(1))
        val sfBase = new java.io.File(sfDir).getName
        if (!sfTag.exists(t => new java.io.File(t).getName == sfBase)) Map.empty
        else {
          val best = s.indexOf("\"best\"")
          val bestMap =
            if (best < 0) Map.empty[String, Double]
            else """"(q_[A-Za-z0-9_]+)"\s*:\s*([0-9.]+)""".r
              .findAllMatchIn(s.substring(best))
              .map(m => m.group(1) -> m.group(2).toDouble).toMap
          val confirmed = """"(q_[A-Za-z0-9_]+)"\s*:\s*\[([0-9.,\sEe+-]*)\]""".r
            .findAllMatchIn(s)
            .flatMap { m =>
              val rs = m.group(2).split(",").toSeq
                .map(_.trim).filter(_.nonEmpty).map(_.toDouble)
              confirmedBest(rs).map(m.group(1) -> _)
            }.toMap
          bestMap ++ confirmed
        }
      }
    } catch { case scala.util.control.NonFatal(_) => Map.empty }

  /** The ledger's best CALIBRATION reading (same file, ledger-level key,
    * no sf gating — the workload is data-independent). None when the
    * ledger predates calibration or is unreadable.
    */
  private[graft] def loadBestCalib(): Option[Double] =
    try {
      val p = java.nio.file.Paths.get(
        sys.env.getOrElse("GRAFT_BENCH_BEST", "BENCH_BEST.json"))
      if (!java.nio.file.Files.isReadable(p)) None
      else {
        val s = new String(java.nio.file.Files.readAllBytes(p), "UTF-8")
        """"calibration"\s*:\s*([0-9.]+)""".r.findFirstMatchIn(s)
          .map(_.group(1).toDouble).filter(_ > 0)
      }
    } catch { case scala.util.control.NonFatal(_) => None }

  /** Per-gate ratio to the ledger best, skipping unusable ledger entries
    * (best <= 0 — fmt3 rounds sub-ms gates to 0.000 before the ledger
    * ingests them; a division there would print 'Infinity' and corrupt
    * the JSON line).
    */
  private[graft] def vsBestRatios(perQuery: Seq[(String, Option[Double])],
      best: Map[String, Double]): Seq[(String, Double)] =
    perQuery.collect { case (k, Some(v)) if best.get(k).exists(_ > 0) =>
      k -> v / best(k)
    }

  /** Suite drift: the MEDIAN of the per-gate ratios to best (r17). The
    * single-thread calibration workload catches CPU-frequency/co-tenant
    * drift but is blind to multithread memory-bandwidth and page-cache
    * contention — which inflate every 32-thread gate while calibration
    * reads ~1.0 (the r17 session: two back-to-back runs at box_drift
    * 1.02 with EVERY gate uniformly 1.1–1.4× of best, including gates
    * whose code hadn't changed in five rounds). Sixteen independent
    * gates don't regress in lockstep; their median moving IS the
    * ambient factor. Requires ≥ `MinSuiteGates` ratios (a filtered
    * -family child must not self-normalize on two gates); capped at
    * [[SuiteDriftCap]] so a genuinely global code regression (a session
    * conf change, a tables-layer slowdown) still flags instead of
    * normalizing itself away.
    */
  private[graft] val SuiteDriftCap = 1.5
  private[graft] val MinSuiteGates = 8
  private[graft] def suiteDrift(ratios: Seq[(String, Double)]): Option[Double] =
    if (ratios.size < MinSuiteGates) None
    else Some(median(ratios.map(_._2)))

  /** The regression watch list: gates whose NORMALIZED ratio to best
    * exceeds 1.2×. The normalizer is the larger of the calibration
    * box-drift and the (capped) suite drift, clamped at 1.0 — a slower
    * box forgives proportionally on whichever axis it shows (CPU via
    * calibration, memory/IO via the suite median), a faster-than-best
    * box never tightens the bar (that would convert noise into false
    * flags), and a single-gate slowdown moves neither normalizer, so it
    * still flags.
    */
  private[graft] def regressionsFor(ratios: Seq[(String, Double)],
      drift: Option[Double]): Seq[String] = {
    val suite = suiteDrift(ratios).map(math.min(_, SuiteDriftCap)).getOrElse(1.0)
    val norm = math.max(math.max(drift.getOrElse(1.0), suite), 1.0)
    ratios.collect { case (k, r) if r / norm > 1.2 => k }
  }

  /** Emit the one-line JSON contract where no log framing can touch it
    * (r17 verdict #2: the driver's extractor failed to recover the line
    * from sbt's `[info] `-prefixed stdout two rounds running). The line
    * still prints to stdout — last, and unprefixed now that build.sbt
    * passes the forked run's output through verbatim — AND is written
    * byte-identically to `GRAFT_BENCH_OUT` (default `bench_out.json`) so
    * a parser that reads neither framing nor ordering can recover it from
    * the file. Same line, two sinks; the timing protocol is untouched.
    */
  private[graft] def emitContract(line: String,
      out: String = sys.env.getOrElse("GRAFT_BENCH_OUT", "bench_out.json")): Unit = {
    println(line)
    try
      java.nio.file.Files.write(java.nio.file.Paths.get(out),
        (line + "\n").getBytes("UTF-8"))
    catch { case scala.util.control.NonFatal(e) =>
      System.err.println(s"[bench] could not write $out: ${e.getMessage}") }
    ()
  }

  private def jsonLine(perQuery: Seq[(String, Option[Double])],
      spreadOpt: Option[(Double, Double)], sfDir: String, runs: Int,
      failed: Set[String], calibration: Option[Double]): String = {
    val qs = perQuery.map {
      case (k, Some(v)) => jstr(k) + ":" + fmt3(v)
      case (k, None)    => jstr(k) + ":null"
    }.mkString("{", ",", "}")
    val total = perQuery.flatMap(_._2).sum
    // spread is null when it could not be measured faithfully (a family
    // child died before reporting) — a silently understated min/max would
    // read as a better bench than was run
    val spread = spreadOpt
      .map { case (mn, mx) => s"""{"min":${fmt3(mn)},"max":${fmt3(mx)}}""" }
      .getOrElse("null")
    val errs = failed.toSeq.sorted.map(jstr).mkString("[", ",", "]")
    // the regression ledger: per-gate ratio to the best same-protocol
    // reading on record, and an explicit watch list past 1.2× — "probably
    // environmental" hid a 12× scan cost for two rounds (the r14
    // tokenizer episode); an in-artifact flag can't be skipped over
    val best = loadBest(sfDir)
    val ratios = vsBestRatios(perQuery, best)
    val vsBest =
      if (best.isEmpty) "null"
      else ratios.map { case (k, r) => jstr(k) + ":" + fmt3(r) }
        .mkString("{", ",", "}")
    // box drift: this run's calibration over the ledger's best reading —
    // the self-calibration that keeps ambient load from masquerading as
    // per-gate regressions (or hiding one); vs_best stays RAW so the
    // artifact shows both the measured ratio and the drift it's judged
    // against
    val drift = for (c <- calibration; b <- loadBestCalib()) yield c / b
    val regressions =
      if (best.isEmpty) "null"
      else regressionsFor(ratios, drift).map(jstr).mkString("[", ",", "]")
    val calib = calibration.map(fmt3).getOrElse("null")
    val driftS = drift.map(fmt3).getOrElse("null")
    // suite_drift is shown RAW (uncapped) so the artifact records how
    // uniformly inflated the run was; flags are judged on the capped value
    val suiteS = suiteDrift(ratios).map(fmt3).getOrElse("null")
    s"""{"metric":"total","value":${fmt3(total)},"unit":"sec","queries":$qs,"sf":"$sfDir","runs":$runs,"spread":$spread,"errors":$errs,"calibration":$calib,"box_drift":$driftS,"suite_drift":$suiteS,"vs_best":$vsBest,"regressions":$regressions}"""
  }

  /** Family partition for `-families` mode — the run_sf100.sh lesson
    * applied to the bench: at data-bound rungs one marathon JVM measures
    * its own accumulated heap/spill state, not the queries; a fresh JVM
    * per family reclaims shuffle spill and old-gen at process exit. Any
    * headline query not listed lands in a trailing `other` family so a
    * new headline gate can't be silently dropped from the total.
    */
  private[graft] val families: Seq[(String, Seq[String])] = Seq(
    "scanagg" -> Seq("q_scan_filter", "q_agg", "q_window_day"),
    "join" -> Seq("q_inner_join", "q_anti_join"),
    "text" -> Seq("q_tokens", "q_dedup_exact"),
    "minhash" -> Seq("q_dedup_minhash"),
    "simhash" -> Seq("q_dedup_simhash"),
    "ann" -> Seq("q_ann_topk", "q_ann_lsh"),
    "etl" -> Seq("q_etl_stateless", "q_etl_denorm", "q_session_window"),
    // the round-12 heavyweights: most expensive plans in the inventory,
    // benched from r13 so they carry a regression baseline
    "clean" -> Seq("q_span_dedup", "q_clean_pipeline"))

  /** Fork one fresh JVM per family (same classpath, the parent's
    * --add-opens/-D flags, heap from GRAFT_BENCH_FAMILY_MEM or the
    * parent's -Xmx); each child runs the standard median-of-n suite
    * restricted to its family and reports `BENCHQ`/`BENCHSPREAD`/
    * `BENCHERR` lines on stdout. The parent sums family medians into the
    * same one-line JSON contract; the reported spread is the sum of
    * per-family min/max totals (families run sequentially, so the sums
    * bound any single sequential pass).
    */
  /** The executed family plan: the static partition plus an `other`
    * catch-all for unlisted headline gates. Exposed (package-private) so
    * BenchFamiliesSpec asserts coverage of the PRODUCTION plan, not a
    * re-derivation of it.
    */
  private[graft] def familyPlan(headline: Seq[String]): Seq[(String, Seq[String])] = {
    val listed = families.flatMap(_._2).toSet
    val missing = headline.filterNot(listed)
    require(listed.subsetOf(headline.toSet),
      s"families list stale gates: ${listed.diff(headline.toSet)}")
    if (missing.isEmpty) families else families :+ ("other" -> missing)
  }

  private def runFamilies(sfDir: String, runs: Int): Unit = {
    import scala.jdk.CollectionConverters._
    val headline = Registry.all.filter(_.headline).map(_.name)
    val plan = familyPlan(headline)
    val jvm = java.lang.management.ManagementFactory.getRuntimeMXBean.getInputArguments.asScala
    val passthrough = jvm.zipWithIndex.flatMap { case (a, i) =>
      // space AND '=' forms of both module flags; a truncated space-form
      // flag at the end of the arg list passes through as-is rather than
      // throwing on the missing operand
      if (a == "--add-opens" || a == "--add-exports")
        a +: jvm.lift(i + 1).toSeq
      else if (a.startsWith("--add-opens=") || a.startsWith("--add-exports=") ||
               a.startsWith("-D")) Seq(a)
      else Nil
    }
    val mem = sys.env.getOrElse("GRAFT_BENCH_FAMILY_MEM",
      jvm.find(_.startsWith("-Xmx")).map(_.stripPrefix("-Xmx")).getOrElse("8g"))
    val javaBin = new java.io.File(new java.io.File(
      System.getProperty("java.home"), "bin"), "java").getAbsolutePath
    val results = plan.map { case (fam, qs) =>
      val cmd = Seq(javaBin, s"-Xmx$mem") ++ passthrough ++ Seq(
        "-cp", System.getProperty("java.class.path"),
        "graft.Bench", "-family", qs.mkString(","))
      System.err.println(s"[bench] family $fam: ${qs.mkString(",")} (fresh JVM, -Xmx$mem)")
      val pb = new ProcessBuilder(cmd: _*)
      pb.redirectError(ProcessBuilder.Redirect.INHERIT)
      val p = pb.start()
      val out = scala.io.Source.fromInputStream(p.getInputStream).getLines().toVector
      val rc = p.waitFor()
      if (rc != 0) System.err.println(s"[bench] family $fam exited rc=$rc")
      val perQ = qs.map { q =>
        q -> out.collectFirst { case l if l.startsWith(s"BENCHQ $q ") =>
          l.split(" ")(2) }.filter(_ != "null").map(_.toDouble)
      }
      val spread = out.collectFirst { case l if l.startsWith("BENCHSPREAD ") =>
        val Array(_, mn, mx) = l.split(" "); (mn.toDouble, mx.toDouble) }
      val calib = out.collectFirst { case l if l.startsWith("BENCHCALIB ") =>
        l.stripPrefix("BENCHCALIB ").toDouble }
      val errs = out.collect { case l if l.startsWith("BENCHERR ") => l.stripPrefix("BENCHERR ") }
      // a child that died before reporting marks its whole family failed
      val dead = if (rc != 0 || spread.isEmpty) qs.filterNot(errs.contains).filter(
        q => perQ.find(_._1 == q).exists(_._2.isEmpty)) else Nil
      (perQ, spread, errs ++ dead, calib)
    }
    val perQuery = results.flatMap(_._1)
    val spreads = results.map(_._2)
    val failed = results.flatMap(_._3).toSet
    // per-family calibration readings, medianed: one number that moved
    // only if the BOX did during this run's window
    val calibs = results.flatMap(_._4)
    val calibration = if (calibs.isEmpty) None else Some(median(calibs))
    // families run sequentially, so summed per-family min/max bound any
    // single sequential pass — but ONLY if every family reported; a dead
    // family would silently understate the spread, so it nulls instead
    val spreadSum =
      if (spreads.forall(_.isDefined))
        Some((spreads.flatten.map(_._1).sum, spreads.flatten.map(_._2).sum))
      else None
    emitContract(jsonLine(perQuery, spreadSum, sfDir, runs, failed, calibration))
  }

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val runs = sys.env.getOrElse("GRAFT_BENCH_RUNS", "5").toInt.max(1)

    // Family isolation IS the official protocol (r13 verdict #3): one
    // marathon JVM measures its own accumulated heap/spill/JIT state, not
    // the plans — q_dedup_minhash moved 0.712 → 1.425 s on identical code
    // purely from suite ordering. Default (what the driver runs) forks a
    // fresh JVM per family; `-marathon` keeps the old single-JVM suite
    // for ladder ratio work and cross-validation (BenchFamiliesSpec).
    if (args.contains("-families") || args.isEmpty) {
      runFamilies(sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"), runs)
      return
    }

    val spark = GraftSession.builder(s"local[$cpus]", cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    if (args.contains("-family")) {
      // child mode for -families: machine lines on stdout, no JSON
      val names = args(args.indexOf("-family") + 1).split(",").toSet
      val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
      // calibration BEFORE the timed suite, same process conditions
      val calib = calibrateMin()
      val (perQuery, totals, failed) = runSuite(spark, sfDir, runs, Some(names))
      perQuery.foreach { case (k, v) =>
        println(s"BENCHQ $k ${v.map(fmt3).getOrElse("null")}") }
      println(s"BENCHSPREAD ${fmt3(totals.min)} ${fmt3(totals.max)}")
      println(s"BENCHCALIB ${fmt3(calib)}")
      failed.toSeq.sorted.foreach(f => println(s"BENCHERR $f"))
      spark.stop()
      return
    }

    if (args.contains("-ladder")) {
      // every rung present: driver-written sf dirs + locally generated ones
      val rungs = Seq(
        "/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1",
        "testdata-sf1", "testdata-sf10", "testdata-sf100")
        .filter(d => new java.io.File(s"$d/lineitem.parquet").exists())
      val rows = rungs.map { d =>
        val calib = calibrateMin()
        val (perQuery, totals, failed) = runSuite(spark, d, runs)
        println(jsonLine(perQuery, Some((totals.min, totals.max)), d, runs,
          failed, Some(calib)))
        (d, perQuery.flatMap(_._2).sum, totals.min, totals.max, failed)
      }
      println("\n| sf dir | median total (s) | min | max | errors |")
      println("| --- | --- | --- | --- | --- |")
      rows.foreach { case (d, t, mn, mx, failed) =>
        val err = if (failed.isEmpty) "" else failed.toSeq.sorted.mkString("FAILED: ", ", ", "")
        println(f"| $d | $t%.1f | $mn%.1f | $mx%.1f | $err |")
      }
    } else if (args.contains("-marathon")) {
      val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
      val calib = calibrateMin()
      val (perQuery, totals, failed) = runSuite(spark, sfDir, runs)
      emitContract(jsonLine(perQuery, Some((totals.min, totals.max)), sfDir, runs,
        failed, Some(calib)))
    } else {
      System.err.println(s"[bench] unknown args: ${args.mkString(" ")}")
      sys.exit(2)
    }
    spark.stop()
  }
}
