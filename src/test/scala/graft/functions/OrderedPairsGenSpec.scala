package graft.functions

import graft.GraftSession
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins [[OrderedPairsGen]] to the self-join formulation it replaced in
  * minhashPairs' candidate generation: for every bucket membership list,
  * exploding the generator must produce the SAME PAIR MULTISET as
  * `l.join(r, bucket).filter(a < b)` — including duplicate-id
  * multiplicities (the join emits (x, y) once per occurrence pair;
  * multiset equality is what makes the downstream `distinct()` collapse
  * both shapes to identical candidates).
  */
class OrderedPairsGenSpec extends AnyFunSuite {

  lazy val spark: SparkSession = GraftSession.local(4)

  private def joinPairs(ids: Seq[Long]): Seq[(Long, Long)] =
    for (x <- ids; y <- ids if x < y) yield (x, y)

  private def genPairs(ids: Seq[Long]): Seq[(Long, Long)] = {
    import spark.implicits._
    Seq(ids).toDF("ids")
      .select(OrderedPairsGen.orderedPairs(col("ids")).as(Seq("a", "b")))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
  }

  private def asMultiset(ps: Seq[(Long, Long)]): Map[(Long, Long), Int] =
    ps.groupBy(identity).view.mapValues(_.size).toMap

  test("pair multiset == self-join a<b multiset (edges + random lists with dups)") {
    val cases: Seq[Seq[Long]] = Seq(
      Seq.empty, Seq(7L), Seq(7L, 7L), Seq(7L, 7L, 7L),
      Seq(1L, 2L), Seq(2L, 1L), Seq(3L, 1L, 2L),
      Seq(5L, 5L, 7L), Seq(7L, 5L, 5L, 5L, 9L, 9L),
      Seq(Long.MinValue, -1L, 0L, Long.MaxValue),
      Seq(-3L, -3L, -1L)) ++ {
      val rnd = new scala.util.Random(18)
      (0 until 30).map { _ =>
        val n = rnd.nextInt(12)
        Seq.fill(n)(rnd.nextInt(6).toLong - 2) // narrow domain → many dups
      }
    }
    cases.foreach { ids =>
      assert(asMultiset(genPairs(ids)) == asMultiset(joinPairs(ids)),
        s"pair multiset drifted for $ids")
    }
  }

  test("null array yields no pairs; generated order is sorted-nested") {
    import spark.implicits._
    val n = Seq(Option.empty[Seq[Long]]).toDF("ids")
      .select(OrderedPairsGen.orderedPairs(col("ids")).as(Seq("a", "b")))
      .count()
    assert(n == 0)
    assert(genPairs(Seq(3L, 1L, 2L)) ==
      Seq((1L, 2L), (1L, 3L), (2L, 3L)))
  }
}
