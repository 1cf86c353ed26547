package graft.ml

import graft.GraftSession
import graft.functions.{topkPairs, TopKHeap}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import scala.util.Random

class TopKSpec extends AnyFunSuite {

  lazy val spark = GraftSession.local(4)

  test("scale-path mean pooling == deterministic fold (to float tolerance)") {
    import org.apache.spark.sql.functions._
    val dir = "/root/testdata/sf0.001"
    val e = graft.sources.Tables.embeddings(spark, dir)
      .select(col("label").cast("long").as("label"),
        col("embedding").cast("array<double>").as("v"))
    val scale = AnnOps.meanPoolByKey(e, "label", "v")
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    val fold = e.select(col("label"), struct(lit(0L).as("vec_id"), col("v")).as("sv"))
      .groupBy("label").agg(collect_list(col("sv")).as("svs"))
      .select(col("label"),
        graft.functions.meanPool(transform(col("svs"), s => s.getField("v"))).as("c"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    assert(scale.keySet == fold.keySet)
    for (k <- scale.keySet) {
      val diffs = scale(k).zip(fold(k)).map { case (a, b) => math.abs(a - b) }
      assert(diffs.max < 1e-9, s"label $k diverges by ${diffs.max}")
    }
  }

  test("heap keeps the k best with (sim desc, id asc) tie-breaks") {
    val h = new TopKHeap(3)
    h.offer(0.5, 10); h.offer(0.9, 20); h.offer(0.5, 5)
    h.offer(0.7, 30); h.offer(0.5, 1) // evicts (0.5, 10)
    assert(h.sortedBest.toSeq == Seq((0.9, 20L), (0.7, 30L), (0.5, 1L)))
    // absorb merges two partial heaps like one pass over both inputs
    val a = new TopKHeap(2); a.offer(0.3, 1); a.offer(0.1, 2)
    val b = new TopKHeap(2); b.offer(0.2, 3); b.offer(0.4, 4)
    a.absorb(b)
    assert(a.sortedBest.toSeq == Seq((0.4, 4L), (0.3, 1L)))
  }

  test("topk_pairs aggregate == rank-window on random pairs") {
    import spark.implicits._
    val rnd = new Random(7)
    // duplicate sims exercise tie-breaking; candidate ids are unique per
    // group (as in real search — one row per (query, candidate))
    val pairs = Seq.tabulate(5000) { i =>
      (i % 17L, rnd.nextInt(20) / 20.0, (i / 17).toLong)
    }.toDF("q_id", "sim", "n_id").repartition(8)

    val viaAgg = pairs.groupBy("q_id")
      .agg(topkPairs(col("sim"), col("n_id"), 5).as("top"))
      .select(col("q_id"), posexplode(col("top")).as(Seq("rk0", "t")))
      .select(col("q_id"), col("t.n_id"), col("t.sim"),
        (col("rk0") + 1).cast("long").as("rk"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3))).toSet

    val w = Window.partitionBy("q_id").orderBy(col("sim").desc, col("n_id").asc)
    val viaWindow = pairs
      // the window ranks (q_id, n_id) pairs; collapse duplicate candidate
      // ids the way the heap sees distinct rows — keep all rows, ranking
      // is still a total order so results must agree exactly
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 5)
      .select(col("q_id"), col("n_id"), col("sim"), col("rk").cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3))).toSet

    assert(viaAgg == viaWindow)
  }
}
