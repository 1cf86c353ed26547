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

  /** One warm-up pass then `runs` timed passes over the headline suite;
    * returns (per-query medians in suite order, per-run totals, failed
    * query names). A failed query must surface as an error, not as a
    * fast-fail elapsed time masquerading as a good number.
    */
  private def runSuite(spark: SparkSession, sfDir: String,
      runs: Int): (Seq[(String, Double)], Seq[Double], Set[String]) = {
    val headline = Registry.all.filter(_.headline)
    headline.foreach(q => try q.run(spark, sfDir).count()
      catch { case _: Throwable => () })
    val failed = scala.collection.mutable.Set[String]()
    val samples: Seq[Seq[(String, Double)]] = (1 to runs).map { _ =>
      headline.map { q =>
        val t0 = System.nanoTime()
        try q.run(spark, sfDir).count()
        catch { case e: Throwable =>
          failed += q.name
          System.err.println(s"[bench] ${q.name} failed: ${e.getMessage}")
        }
        q.name -> (System.nanoTime() - t0) / 1e9
      }
    }
    val perQuery = headline.map { q =>
      q.name -> median(samples.map(_.find(_._1 == q.name).map(_._2).getOrElse(0.0)))
    }
    (perQuery, samples.map(_.map(_._2).sum), failed.toSet)
  }

  private def jsonLine(perQuery: Seq[(String, Double)], runTotals: Seq[Double],
      sfDir: String, runs: Int, failed: Set[String]): String = {
    val qs = perQuery.map { case (k, v) => "\"" + k + f"\":$v%.3f" }
      .mkString("{", ",", "}")
    val total = perQuery.map(_._2).sum
    val spread = f"""{"min":${runTotals.min}%.3f,"max":${runTotals.max}%.3f}"""
    val errs = failed.toSeq.sorted.map("\"" + _ + "\"").mkString("[", ",", "]")
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
        (d, perQuery.map(_._2).sum, totals.min, totals.max)
      }
      println("\n| sf dir | median total (s) | min | max |")
      println("| --- | --- | --- | --- |")
      rows.foreach { case (d, t, mn, mx) =>
        println(f"| $d | $t%.1f | $mn%.1f | $mx%.1f |")
      }
    } else {
      val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
      val (perQuery, totals, failed) = runSuite(spark, sfDir, runs)
      println(jsonLine(perQuery, totals, sfDir, runs, failed))
    }
    spark.stop()
  }
}
