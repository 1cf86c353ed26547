package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One verifiable operator query: a Spark implementation plus (when the
  * semantics are SQL-expressible) an equivalent DuckDB oracle over the same
  * parquet tables. Column names/types must line up exactly — the driver sorts
  * columns by name and hashes values.
  *
  * `headline` marks the queries Bench times per round.
  */
final case class GQuery(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String],
    headline: Boolean = false)

object Registry {
  /** Full inventory; populated by the operator modules. Order is the order
    * Verify dumps them in (stable, alphabetical for sanity).
    */
  lazy val all: Seq[GQuery] =
    (graft.operators.Relational.queries ++
      graft.operators.Connector.queries ++
      graft.operators.AsofJoin.queries ++
      graft.operators.RangeJoin.queries ++
      graft.ml.TextOps.queries ++
      graft.ml.CleanOps.queries ++
      graft.ml.DedupOps.queries ++
      graft.ml.ClusterOps.queries ++
      graft.ml.PackOps.queries ++
      graft.ml.AnnOps.queries ++
      graft.ml.MultimodalOps.queries ++
      graft.etl.EtlOps.queries ++
      graft.streaming.StreamQueries.queries)
      .sortBy(_.name)

  lazy val byName: Map[String, GQuery] = all.map(q => q.name -> q).toMap
}
