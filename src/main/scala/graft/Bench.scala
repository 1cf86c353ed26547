package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: times the headline queries on SPARK_GRAFT_SF_DIR and
  * prints one JSON line (driver contract).
  *
  * The suite is run `GRAFT_BENCH_RUNS` times (default 5) after one untimed
  * warm-up pass (JIT + parquet footer cache); the reported per-query number
  * is the MEDIAN across runs and `value` is the sum of medians, so a single
  * noisy run (GC pause, co-tenant load) can no longer ship as the round's
  * number. `spread` records min/max of the per-run totals for the record.
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

  /** One warm-up pass then `runs` timed passes over the headline suite;
    * returns (per-query medians in suite order — None when a query never
    * succeeded, per-run totals over SUCCESSFUL samples only, failed query
    * names). A failed run contributes NO sample: its fast-fail elapsed
    * time would otherwise pull the median (and the headline total) BELOW
    * a healthy rung's, making a broken query read as a fast one.
    */
  private def runSuite(spark: SparkSession, sfDir: String,
      runs: Int): (Seq[(String, Option[Double])], Seq[Double], Set[String]) = {
    val headline = Registry.all.filter(_.headline)
    headline.foreach(q => try q.run(spark, sfDir).count()
      catch { case _: Throwable => () })
    val failed = scala.collection.mutable.Set[String]()
    val samples: Seq[Seq[(String, Double)]] = (1 to runs).map { _ =>
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

  private def jsonLine(perQuery: Seq[(String, Option[Double])], runTotals: Seq[Double],
      sfDir: String, runs: Int, failed: Set[String]): String = {
    val qs = perQuery.map {
      case (k, Some(v)) => jstr(k) + f":$v%.3f"
      case (k, None)    => jstr(k) + ":null"
    }.mkString("{", ",", "}")
    val total = perQuery.flatMap(_._2).sum
    val spread = f"""{"min":${runTotals.min}%.3f,"max":${runTotals.max}%.3f}"""
    val errs = failed.toSeq.sorted.map(jstr).mkString("[", ",", "]")
    f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qs,"sf":"$sfDir","runs":$runs,"spread":$spread,"errors":$errs}"""
  }

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val runs = sys.env.getOrElse("GRAFT_BENCH_RUNS", "5").toInt.max(1)
    val spark = GraftSession.builder(s"local[$cpus]", cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    if (args.contains("-ladder")) {
      // every rung present: driver-written sf dirs + locally generated ones
      val rungs = Seq(
        "/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1",
        "testdata-sf1", "testdata-sf10", "testdata-sf100")
        .filter(d => new java.io.File(s"$d/lineitem.parquet").exists())
      val rows = rungs.map { d =>
        val (perQuery, totals, failed) = runSuite(spark, d, runs)
        println(jsonLine(perQuery, totals, d, runs, failed))
        (d, perQuery.flatMap(_._2).sum, totals.min, totals.max, failed)
      }
      println("\n| sf dir | median total (s) | min | max | errors |")
      println("| --- | --- | --- | --- | --- |")
      rows.foreach { case (d, t, mn, mx, failed) =>
        val err = if (failed.isEmpty) "" else failed.toSeq.sorted.mkString("FAILED: ", ", ", "")
        println(f"| $d | $t%.1f | $mn%.1f | $mx%.1f | $err |")
      }
    } else {
      val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
      val (perQuery, totals, failed) = runSuite(spark, sfDir, runs)
      println(jsonLine(perQuery, totals, sfDir, runs, failed))
    }
    spark.stop()
  }
}
