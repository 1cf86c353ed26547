package graft

import java.nio.file.{Files, Paths, StandardOpenOption}

/** Dev tool (guide §7.2): dump `.explain("formatted")` for registry gates
  * to files, one per gate — the plan evidence the optimization rounds
  * commit under plans/<round>/. Composes the plan only (no execution), so
  * gate-internal primes are skipped via each gate's plan-only path where
  * one exists; gates whose construction is side-effecting still run their
  * metadata jobs.
  *
  * usage: PlanDump <outDir> [sfDir] [gate,gate,...]
  *   default sfDir /root/testdata/sf0.1; default gates = the headline set.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val outDir = args.headOption.getOrElse {
      System.err.println("usage: PlanDump <outDir> [sfDir] [gates]"); sys.exit(2)
    }
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val names =
      if (args.length > 2) args(2).split(",").map(_.trim).toSeq
      else Registry.all.filter(_.headline).map(_.name)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.builder(s"local[$cpus]", cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Files.createDirectories(Paths.get(outDir))
    val suffix = sys.env.getOrElse("GRAFT_PLAN_SUFFIX", "")
    names.foreach { n =>
      Registry.byName.get(n) match {
        case None => System.err.println(s"[plandump] unknown gate $n")
        case Some(q) =>
          try {
            val df = q.run(spark, sfDir)
            // same string explain("formatted") prints, captured to a file
            val txt = df.queryExecution.explainString(
              org.apache.spark.sql.execution.FormattedMode)
            Files.write(Paths.get(outDir, s"$n$suffix.txt"),
              txt.getBytes("UTF-8"),
              StandardOpenOption.CREATE, StandardOpenOption.TRUNCATE_EXISTING)
            println(s"[plandump] wrote $outDir/$n$suffix.txt")
          } catch { case e: Throwable =>
            System.err.println(s"[plandump] $n failed: ${e.getMessage}")
          }
      }
    }
    spark.stop()
  }
}
