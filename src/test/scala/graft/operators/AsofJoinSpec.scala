package graft.operators

import graft.GraftSession
import org.scalatest.funsuite.AnyFunSuite

class AsofJoinSpec extends AnyFunSuite {

  lazy val spark = GraftSession.local(4)

  test("as-of semantics: latest right at-or-before, inclusive, per key") {
    import spark.implicits._
    val left = Seq((1L, 10L, "a"), (1L, 20L, "b"), (1L, 5L, "c"), (2L, 15L, "d"))
      .toDF("uid", "ts", "tag")
    val right = Seq((1L, 5L, 100.0), (1L, 18L, 200.0), (3L, 1L, 999.0))
      .toDF("uid", "ts", "amt")
    val got = AsofJoin.asofJoin(left, right, Seq("uid"), "ts", Seq("amt"))
      .select("uid", "ts", "tag", "asof_amt")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        Option(r.get(3)).map(_.asInstanceOf[Double]))).toSet
    assert(got == Set(
      (1L, 10L, "a", Some(100.0)),  // 5 <= 10 < 18
      (1L, 20L, "b", Some(200.0)),  // latest at 18
      (1L, 5L, "c", Some(100.0)),   // equality is inclusive
      (2L, 15L, "d", None)))        // no right rows for uid 2
  }

  test("a genuinely-null payload field is returned, not skipped for a stale one") {
    import spark.implicits._
    val left = Seq((1L, 20L)).toDF("uid", "ts")
    // latest right row at ts=18 has amt NULL; a per-column fill would
    // leak amt=100 from ts=5 and tear the row (tag from 18, amt from 5)
    val right = Seq((1L, 5L, Some(100.0), "early"), (1L, 18L, None, "late"))
      .toDF("uid", "ts", "amt", "tag")
    val got = AsofJoin.asofJoin(left, right, Seq("uid"), "ts", Seq("amt", "tag"))
      .select("asof_amt", "asof_tag").collect().head
    assert(got.isNullAt(0) && got.getString(1) == "late",
      s"want (null, late), got $got")
  }

  test("one keyed shuffle, no nested-loop join in the plan") {
    import spark.implicits._
    val left = (1L to 100L).map(i => (i % 7, i, s"t$i")).toDF("uid", "ts", "tag")
    val right = (1L to 50L).map(i => (i % 7, i * 2, i.toDouble)).toDF("uid", "ts", "amt")
    val plan = AsofJoin.asofJoin(left, right, Seq("uid"), "ts", Seq("amt"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("NestedLoop") && !plan.contains("CartesianProduct"), plan)
  }
}
