package graft.ml

import graft.sources.Tables
import org.apache.spark.sql.functions._

/** Dev tool: print the RAW avg/min recall@5 of the in-plan IVF+PQ search
  * ([[AnnOps.ivfPqTopK]]) at a given sf dir — the number the q_ann_ivfpq
  * gate's pinned floor is calibrated against (the gate itself only
  * exposes floor booleans, by design).
  *
  * usage: run_main.sh graft.ml.AnnRecallProbe [sfDir...]
  */
object AnnRecallProbe {
  def main(args: Array[String]): Unit = {
    val dirs = if (args.nonEmpty) args.toSeq else Seq("/root/testdata/sf0.001")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = graft.GraftSession.builder(s"local[$cpus]", cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (d <- dirs) {
      val all = Tables.embeddings(spark, d)
        .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      val qs = all.filter(col("vec_id") < 20)
      val r = AnnOps.recallVsExact(all, qs, 5, AnnOps.ivfPqTopK(all, qs, 5))
        .agg(avg("recall").as("avg"), min("recall").as("min")).head()
      println(f"IVFPQ_RECALL dir=$d avg=${r.getDouble(0)}%.4f min=${r.getDouble(1)}%.4f")
    }
    spark.stop()
  }
}
