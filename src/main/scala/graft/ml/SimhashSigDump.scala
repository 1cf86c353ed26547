package graft.ml

import org.apache.spark.sql.functions._

/** Scale-verification stage A for `q_dedup_simhash` (dev tool, like
  * AnnBatchCheck): dumps the per-doc 64-bit signature — the intermediate
  * the pair gate is a pure function of — plus the signature-stage oracle
  * SQL for the chunked DuckDB checker.
  *
  * Why this exists: the gate's OUTPUT is pair-per-row, so doc_id-modulus
  * chunks of the full pair oracle are invalid (a pair depends on two
  * docs), and the one-shot oracle's HUGEINT XXH64 intermediates exceed
  * the box's spill disk at sf100. Signatures are row-per-doc → chunking
  * is exact; pairs then re-derive from verified signatures with cheap
  * BIGINT ops (tools/check_simhash_sf100_v2.py).
  */
object SimhashSigDump {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = graft.GraftSession.builder(s"local[$cpus]", cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val parts = sys.env.get("GRAFT_VERIFY_PARTS").map(_.toInt).getOrElse(32)
    graft.sources.Tables.documents(spark, sfDir)
      .select(col("doc_id"), graft.functions.SimHash64Expr.simhash64Native(
        graft.functions.tokens(col("text"))).as("sig"))
      .repartition(parts).write.mode("overwrite").parquet(s"$outDir/simhash_sigs")
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$outDir/simhash_sig_oracle.sql"),
      SimhashOracle.sigSql.getBytes("UTF-8"))
    println("SIG_DUMP_DONE")
    spark.stop()
  }
}
