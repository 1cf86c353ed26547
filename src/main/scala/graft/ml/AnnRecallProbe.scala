package graft.ml

import graft.sources.Tables
import org.apache.spark.sql.functions._

/** Dev tool: print the RAW avg/min recall@5 of an in-plan approximate
  * search ([[AnnOps.ivfPqTopK]] or [[AnnOps.sqTopK]]) at given sf dirs —
  * the numbers the gates' pinned floors are calibrated against (the gates
  * themselves only expose floor booleans, by design).
  *
  * usage: run_main.sh graft.ml.AnnRecallProbe [ivfpq|sq] [sfDir...]
  */
object AnnRecallProbe {
  def main(args: Array[String]): Unit = {
    val (method, rest) = args.headOption match {
      case Some(m @ ("ivfpq" | "sq")) => (m, args.drop(1).toSeq)
      case _ => ("ivfpq", args.toSeq)
    }
    val dirs = if (rest.nonEmpty) rest else Seq("/root/testdata/sf0.001")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = graft.GraftSession.builder(s"local[$cpus]", cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (d <- dirs) {
      val all = Tables.embeddings(spark, d)
        .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      val qs = all.filter(col("vec_id") < 20)
      val approx = method match {
        case "sq" => AnnOps.sqTopK(all, qs, 5)
        case _    => AnnOps.ivfPqTopK(all, qs, 5)
      }
      val r = AnnOps.recallVsExact(all, qs, 5, approx)
        .agg(avg("recall").as("avg"), min("recall").as("min")).head()
      println(f"${method.toUpperCase}_RECALL dir=$d " +
        f"avg=${r.getDouble(0)}%.4f min=${r.getDouble(1)}%.4f")
    }
    spark.stop()
  }
}
