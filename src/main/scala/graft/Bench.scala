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
  */
object Bench {
  private def median(xs: Seq[Double]): Double = {
    val s = xs.sorted
    val n = s.length
    if (n % 2 == 1) s(n / 2) else (s(n / 2 - 1) + s(n / 2)) / 2.0
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val runs = sys.env.getOrElse("GRAFT_BENCH_RUNS", "5").toInt.max(1)
    val spark = GraftSession.builder(s"local[$cpus]", cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val headline = Registry.all.filter(_.headline)
    // warm-up: JVM/JIT + file listing; not timed
    headline.foreach(q => try q.run(spark, sfDir).count()
      catch { case _: Throwable => () })

    // runs × queries wall-clock seconds
    val samples: Seq[Seq[(String, Double)]] = (1 to runs).map { _ =>
      headline.map { q =>
        val t0 = System.nanoTime()
        try q.run(spark, sfDir).count()
        catch { case e: Throwable =>
          System.err.println(s"[bench] ${q.name} failed: ${e.getMessage}")
        }
        q.name -> (System.nanoTime() - t0) / 1e9
      }
    }
    val perQuery = headline.map { q =>
      q.name -> median(samples.map(_.find(_._1 == q.name).map(_._2).getOrElse(0.0)))
    }
    val runTotals = samples.map(_.map(_._2).sum)
    val qs = perQuery.map { case (k, v) => "\"" + k + f"\":$v%.3f" }
      .mkString("{", ",", "}")
    val total = perQuery.map(_._2).sum
    val spread = f"""{"min":${runTotals.min}%.3f,"max":${runTotals.max}%.3f}"""
    println(f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qs,"sf":"$sfDir","runs":$runs,"spread":$spread}""")
    spark.stop()
  }
}
