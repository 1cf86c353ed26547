package graft

import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}

/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare.
  */
object Verify {
  def main(args: Array[String]): Unit = {
    // optional 3rd arg: comma-separated gate names to skip (scale-ladder
    // runs, where a handful of gates are exact-verification ops whose WORK
    // — not just whose oracle — is quadratic in the corpus and therefore
    // bounded-corpus by contract; the driver's sf0.01 runs pass no skips).
    // optional 4th arg "--only=a,b,c": dump ONLY those gates — scale
    // campaigns run gate families in FRESH JVMs so one process's shuffle
    // spill (blockmgr) is reclaimed before the next family starts, instead
    // of accumulating 84 gates of spill on one disk.
    val (sfDir, outDir, skip, only) = args match {
      case Array(s, o) => (s, o, Set.empty[String], None)
      case Array(s, o, sk) => (s, o, sk.split(',').map(_.trim).toSet, None)
      case Array(s, o, sk, on) if on.startsWith("--only=") =>
        (s, o, sk.split(',').map(_.trim).toSet,
          Some(on.stripPrefix("--only=").split(',').map(_.trim).toSet))
    }
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = GraftSession.builder(s"local[$cpus]", cpus.toInt)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    SparkEntry.queries.foreach { case (name, fn) =>
      // repartition(1), NOT coalesce(1): coalesce collapses every narrow
      // stage above it to ONE task (a scan→transform query would compute
      // single-threaded end to end — observed 10+ CPU-minutes on one core
      // at sf1), while repartition inserts a shuffle so the plan runs at
      // full parallelism and only the one-file write is serial.
      // GRAFT_VERIFY_PARTS: dump file count. 1 (default) matches the
      // driver contract; scale campaigns set e.g. 32 — a 450M-row gate
      // writes in parallel instead of through one task, and every checker
      // (pandas read_parquet, DuckDB read_parquet glob) reads the
      // directory regardless of file count.
      val parts = sys.env.get("GRAFT_VERIFY_PARTS").map(_.toInt).getOrElse(1)
      if (only.exists(!_.contains(name))) ()
      else if (skip(name)) System.err.println(s"[verify] $name skipped by request")
      else try fn(spark, sfDir).repartition(parts).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
