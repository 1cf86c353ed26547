package graft.etl

import graft.GraftSession
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The two exclusive-bases plan shapes must be value-identical: the array
  * fast path (one aggregation + native prefix scan) is what every
  * realistic m runs; the two-level window form is the unbounded-safe
  * fallback. A drift between them would silently renumber offsets.
  */
class OctaveScanSpec extends AnyFunSuite {

  lazy val spark: SparkSession = GraftSession.local(4)

  private def countsFixture = {
    import spark.implicits._
    // two keys; buckets spanning octave 0 (ids < 2^m region), several
    // higher octaves, a bucket gap, and the out-of-contract -1 bucket
    Seq(
      ("A", -1, 3L), ("A", 0, 5L), ("A", 7, 2L), ("A", 64, 9L),
      ("A", 96, 1L), ("A", 130, 4L), ("A", 200, 8L),
      ("B", 2, 1L), ("B", 65, 2L), ("B", 131, 3L)
    ).toDF("k", "bkt", "cnt")
  }

  private def collect(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2))).toSet

  test("array fast path == two-level window form on a multi-octave fixture") {
    val m = 6
    val a = collect(OctaveScan.arrayBases(countsFixture, "k", "bkt", "cnt", "base"))
    val w = collect(OctaveScan.windowBases(countsFixture, "k", "bkt", "cnt", m, "base"))
    assert(a == w, s"array=${a.toSeq.sorted} window=${w.toSeq.sorted}")
    // and both match the hand-computed exclusive scan
    val expected = Set(
      ("A", -1, 0L), ("A", 0, 3L), ("A", 7, 8L), ("A", 64, 10L),
      ("A", 96, 19L), ("A", 130, 20L), ("A", 200, 24L),
      ("B", 2, 0L), ("B", 65, 1L), ("B", 131, 3L))
    assert(a == expected)
  }

  test("exclusiveBases dispatches on m and both branches agree") {
    val viaDefault = collect(OctaveScan.exclusiveBases(
      countsFixture, "k", "bkt", "cnt", m = 6, "base"))
    val viaFallback = collect(OctaveScan.exclusiveBases(
      countsFixture, "k", "bkt", "cnt", m = OctaveScan.arrayPathMaxM + 1, "base"))
    assert(viaDefault == viaFallback)
  }

  test("randomized fixtures: array path == window path == reference scan") {
    import spark.implicits._
    val rnd = new scala.util.Random(14)
    for (round <- 1 to 5) {
      val m = Seq(6, 8, 12)(rnd.nextInt(3))
      val keys = (1 to (1 + rnd.nextInt(3))).map(i => s"k$i")
      val rows = keys.flatMap { k =>
        val nb = 1 + rnd.nextInt(40)
        // bucket ids drawn across several octaves of the id space, with
        // occasional -1 (out-of-contract negatives)
        val bkts = scala.collection.mutable.Set[Int]()
        while (bkts.size < nb) {
          bkts += (if (rnd.nextInt(10) == 0) -1
            else rnd.nextInt(1 << math.min(m + rnd.nextInt(4), 20)))
        }
        bkts.toSeq.map(b => (k, b, 1L + rnd.nextInt(1000)))
      }
      val counts = rows.toDF("k", "bkt", "cnt")
      val a = collect(OctaveScan.arrayBases(counts, "k", "bkt", "cnt", "base"))
      val w = collect(OctaveScan.windowBases(counts, "k", "bkt", "cnt", m, "base"))
      // reference: plain scala exclusive scan per key over sorted buckets
      val ref = rows.groupBy(_._1).flatMap { case (k, rs) =>
        val sorted = rs.sortBy(_._2)
        sorted.scanLeft(0L)(_ + _._3).zip(sorted).map {
          case (base, (_, b, _)) => (k, b, base)
        }
      }.toSet
      assert(a == ref, s"round $round (m=$m): array != reference")
      assert(w == ref, s"round $round (m=$m): window != reference")
    }
  }

  test("prefix_bases expression: exclusive scan over a sorted struct array") {
    import spark.implicits._
    val out = Seq(Seq((1, 10L), (3, 5L), (9, 7L)), Seq.empty[(Int, Long)])
      .toDF("a")
      .select(graft.functions.PrefixBasesExpr.prefixBases(
        col("a").cast("array<struct<b:int,c:bigint>>")).as("p"))
      .collect().map(_.getSeq[org.apache.spark.sql.Row](0)
        .map(r => (r.getInt(0), r.getLong(1))))
    assert(out(0) == Seq((1, 0L), (3, 10L), (9, 15L)))
    assert(out(1) == Seq.empty)
  }
}
