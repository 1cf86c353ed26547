package graft.ml

import graft.GQuery
import graft.functions._
import graft.sources.Tables._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Duplicate-cluster assignment: connected components over candidate
  * near-dup pairs, so "A≈B, B≈C" collapses to one keep-group even when
  * A and C never pair directly.
  *
  * Algorithm: alternating large-star/small-star edge rewrites (Kiveris et
  * al., MapReduce CC) — O(log n) rounds on the pathological chain, 2-3
  * rounds on real dup clusters. Each round is a groupBy-min plus a join:
  * no adjacency arrays (collect_set would OOM on hub nodes), no
  * driver-side graph, nothing quadratic. That's the 100 TB shape: a
  * billion-edge candidate graph is just a few shuffles keyed by node id,
  * and AQE splits any hub-key skew.
  */
object ClusterOps {

  /** Edges leave every round oriented u > v (child → smaller parent). */
  private def largeStar(e: DataFrame): DataFrame = {
    val sym = e.select(col("u"), col("v"))
      .union(e.select(col("v").as("u"), col("u").as("v")))
    val mins = sym.groupBy("u").agg(min("v").as("mv"))
      .select(col("u"), least(col("mv"), col("u")).as("m"))
    sym.join(mins, Seq("u"))
      .filter(col("v") > col("u"))
      .select(col("v").as("u"), col("m").as("v"))
      .filter(col("u") =!= col("v"))
      .distinct()
  }

  private def smallStar(e: DataFrame): DataFrame = {
    // input oriented u > v; m = min neighbor of u (strictly < u)
    val mins = e.groupBy("u").agg(min("v").as("m"))
    e.join(mins, Seq("u"))
      .select(col("v").as("n"), col("m"))
      .filter(col("n") =!= col("m"))
      .select(col("n").as("u"), col("m").as("v"))
      .union(mins.select(col("u"), col("m").as("v")))
      .distinct()
  }

  /** Component label (= min member id) for every node incident to a pair.
    * `pairs` needs (a, b) id columns; returns (id, component).
    */
  def connectedComponents(pairs: DataFrame, maxIter: Int = 20): DataFrame = {
    val nodes = pairs.select(col("a").as("id"))
      .union(pairs.select(col("b").as("id"))).distinct()
    // localCheckpoint (eager) after every round: iterative self-joins
    // otherwise compound the logical plan ~4× per round and the lineage
    // alone OOMs the driver long before the data does. On a cluster with
    // unreliable executors, swap for reliable checkpoint(dir).
    var edges = pairs
      .select(greatest(col("a"), col("b")).as("u"), least(col("a"), col("b")).as("v"))
      .filter(col("u") =!= col("v")).distinct()
      .localCheckpoint(true)
    var signature = checksum(edges)
    var converged = false
    var iter = 0
    while (!converged && iter < maxIter) {
      val next = smallStar(largeStar(edges)).localCheckpoint(true)
      val nextSig = checksum(next)
      edges = next
      converged = nextSig == signature
      signature = nextSig
      iter += 1
    }
    // fixpoint: stars (child, root); roots don't appear on the left
    nodes
      .join(edges.groupBy("u").agg(min("v").as("component"))
        .select(col("u").as("id"), col("component")), Seq("id"), "left")
      .select(col("id"), coalesce(col("component"), col("id")).as("component"))
  }

  private def checksum(e: DataFrame): (Long, Long) = {
    val r = e.agg(count(lit(1)), sum(hash(col("u"), col("v")).cast("long"))).head()
    (r.getLong(0), if (r.isNullAt(1)) 0L else r.getLong(1))
  }

  // Edge set = the label-blocked embedding-cosine near-dup pairs
  // (identical to q_dedup_embed so the DuckDB side can rebuild it), then
  // CC labels every clustered vector with its component min. The oracle
  // computes the same fixpoint as a recursive transitive closure — tiny
  // in DuckDB at sf0.01, which is exactly why the Spark side uses
  // star-contraction instead.
  private val qDedupCluster = GQuery(
    "q_dedup_cluster",
    (s, d) => {
      val pairs = DedupOps.embedPairs(s, d, 0.35).select("a", "b")
      connectedComponents(pairs)
        .select(col("id").cast("long").as("vec_id"), col("component").cast("long").as("component"))
    },
    Some("""WITH RECURSIVE pairs AS (
              SELECT e1.vec_id AS a, e2.vec_id AS b
              FROM embeddings e1 JOIN embeddings e2
                ON e1.label = e2.label AND e1.vec_id < e2.vec_id
              WHERE floor(list_cosine_similarity(CAST(e1.embedding AS DOUBLE[]), CAST(e2.embedding AS DOUBLE[])) * 10000 + 0.5) / 10000 >= 0.35),
            sym AS (SELECT a AS u, b AS v FROM pairs UNION SELECT b, a FROM pairs),
            nodes AS (SELECT DISTINCT u FROM sym),
            reach(u, v) AS (
              SELECT u, u FROM nodes
              UNION
              SELECT reach.u, sym.v FROM reach JOIN sym ON reach.v = sym.u)
            SELECT CAST(u AS BIGINT) AS vec_id, CAST(min(v) AS BIGINT) AS component
            FROM reach GROUP BY u"""))

  /** Canonical representative per duplicate cluster: the member that
    * maximizes `quality` (ties → lowest id). One join of the cluster
    * assignment against the quality column, one rank per component.
    */
  def keepers(assignment: DataFrame, quality: DataFrame): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("component").orderBy(col("q").desc, col("id").asc)
    assignment.join(quality, Seq("id"))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") === 1)
      .select(col("component"), col("id").as("keep_id"), col("q"))
  }

  // End-to-end dedup decision: embedding near-dup pairs → components →
  // keep the longest document of each cluster (n_chars as the quality
  // proxy; vec_id aligns with doc_id in the test corpus).
  private val qDedupKeep = GQuery(
    "q_dedup_keep",
    (s, d) => {
      val pairs = DedupOps.embedPairs(s, d, 0.35).select("a", "b")
      val quality = documents(s, d)
        .select(col("doc_id").as("id"), col("n_chars").cast("long").as("q"))
      keepers(connectedComponents(pairs), quality)
        .select(col("component").cast("long").as("component"),
          col("keep_id").cast("long").as("keep_id"), col("q"))
    },
    Some("""WITH RECURSIVE pairs AS (
              SELECT e1.vec_id AS a, e2.vec_id AS b
              FROM embeddings e1 JOIN embeddings e2
                ON e1.label = e2.label AND e1.vec_id < e2.vec_id
              WHERE floor(list_cosine_similarity(CAST(e1.embedding AS DOUBLE[]), CAST(e2.embedding AS DOUBLE[])) * 10000 + 0.5) / 10000 >= 0.35),
            sym AS (SELECT a AS u, b AS v FROM pairs UNION SELECT b, a FROM pairs),
            nodes AS (SELECT DISTINCT u FROM sym),
            reach(u, v) AS (
              SELECT u, u FROM nodes
              UNION
              SELECT reach.u, sym.v FROM reach JOIN sym ON reach.v = sym.u),
            cc AS (SELECT u AS id, min(v) AS component FROM reach GROUP BY u),
            ranked AS (
              SELECT cc.component, cc.id, d.n_chars AS q,
                     row_number() OVER (PARTITION BY cc.component
                       ORDER BY d.n_chars DESC, cc.id ASC) AS rk
              FROM cc JOIN documents d ON d.doc_id = cc.id)
            SELECT CAST(component AS BIGINT) AS component,
                   CAST(id AS BIGINT) AS keep_id, CAST(q AS BIGINT) AS q
            FROM ranked WHERE rk = 1"""))

  val queries: Seq[GQuery] = Seq(qDedupCluster, qDedupKeep)
}
