package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted}

/** Stage-level profiler for a single registry gate (dev tool, like
  * AnnBatchCheck): runs the gate `runs` times after one warm-up and
  * prints, per timed run, the wall time plus every completed stage's
  * duration, task count, and first call-site line — the data the Spark
  * UI would show, captured headlessly so scale runs can attribute a
  * gate's cost to its scan / shuffle / window stages.
  *
  * usage: QueryProfile <gateName> [sfDir] [runs]
  *   env GRAFT_PROFILE_COLD=1 — clearCache before each timed run (bench-
  *   comparable cold numbers; default keeps gate-internal persists warm)
  *   env GRAFT_PROFILE_AQE=off — disable adaptive execution for the runs
  *   env GRAFT_PROFILE_NOOP=1 — time a noop-sink write instead of count()
  *   (guide §1.4: count() lets the optimizer prune deterministic
  *   projections — and with parquet aggregate pushdown a pure-projection
  *   gate's count() collapses to a footer metadata read — so count()
  *   under-measures scan-side expression work; the noop sink evaluates
  *   every column of every row)
  */
object QueryProfile {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse {
      System.err.println("usage: QueryProfile <gateName> [sfDir] [runs]"); sys.exit(2)
    }
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val runs = if (args.length > 2) args(2).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.builder(s"local[$cpus]", cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // A/B lever for attributing driver overhead: GRAFT_PROFILE_AQE=off
    // disables adaptive execution for the profiled runs only.
    sys.env.get("GRAFT_PROFILE_AQE").foreach(v =>
      spark.conf.set("spark.sql.adaptive.enabled", (v != "off").toString))
    val q = Registry.all.find(_.name == name).getOrElse {
      System.err.println(s"unknown gate $name"); sys.exit(2)
    }

    val stages = new java.util.concurrent.ConcurrentLinkedQueue[(Int, String, Long, Int)]()
    @volatile var jobs = 0
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = jobs += 1
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
        val si = s.stageInfo
        val ms = (for (a <- si.submissionTime; b <- si.completionTime) yield b - a).getOrElse(-1L)
        stages.add((si.stageId, si.name.linesIterator.next(), ms, si.numTasks))
      }
    })

    // GRAFT_PROFILE_COLD=1 clears the cache before each timed run, matching
    // the bench's cold-per-pass discipline. WITHOUT it, runs 2+ of a gate
    // with an internal persist re-hit run 1's cached intermediate
    // (CacheManager matches by canonicalized plan) — warm-cache numbers
    // that are NOT comparable to BENCH readings (the r14 minhash lesson).
    val cold = sys.env.get("GRAFT_PROFILE_COLD").contains("1")
    val noop = sys.env.get("GRAFT_PROFILE_NOOP").contains("1")
    def act(df: org.apache.spark.sql.DataFrame): Long =
      if (noop) { df.write.format("noop").mode("overwrite").save(); -1L }
      else df.count()
    act(q.run(spark, sfDir)) // warm-up: JIT, codegen, parquet footers
    for (r <- 1 to runs) {
      if (cold) spark.sharedState.cacheManager.clearCache()
      stages.clear(); jobs = 0
      val t0 = System.nanoTime()
      val df = q.run(spark, sfDir)
      val t1 = System.nanoTime()
      df.queryExecution.executedPlan // analysis + optimization + planning
      val t2 = System.nanoTime()
      val n = act(df)
      val t3 = System.nanoTime()
      val sec = (t3 - t0) / 1e9
      Thread.sleep(300) // listener bus is async; let it drain before reporting
      println(f"== run $r: $name $sec%.3f s ($n rows, $jobs jobs)  " +
        f"[build ${(t1 - t0) / 1e9}%.3f  plan ${(t2 - t1) / 1e9}%.3f  " +
        f"exec ${(t3 - t2) / 1e9}%.3f]")
      import scala.jdk.CollectionConverters._
      stages.asScala.toSeq.sortBy(-_._3).foreach { case (id, nm, ms, tasks) =>
        println(f"   stage $id%4d $ms%6d ms $tasks%4d tasks  $nm")
      }
      // GRAFT_PROFILE_PLAN=1 — dump the final executed plan once (last
      // run), for attributing job counts to exchanges/subqueries
      if (r == runs && sys.env.get("GRAFT_PROFILE_PLAN").contains("1"))
        println(df.queryExecution.executedPlan.toString)
    }
    spark.stop()
  }
}
