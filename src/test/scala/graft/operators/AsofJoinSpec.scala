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

  test("skewed variant matches the unsalted result on a 90%-one-key corpus") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    // hot key 1 holds 90% of rows; keys 2..6 share the rest
    def key(i: Int): Long = if (i % 10 != 0) 1L else 2L + rnd.nextInt(5)
    val left = (0 until 2000).map { i =>
      (key(i), 1000L + rnd.nextInt(100000).toLong, i.toLong)
    }.toDF("uid", "ts", "event_id")
    val right = (0 until 800).map { i =>
      (key(i), 1000L + i * 125L, i.toDouble) // unique (uid, ts)
    }.toDF("uid", "ts", "amt")
      .groupBy("uid", "ts")
      .agg(org.apache.spark.sql.functions.max("amt").as("amt"))

    def canon(df: org.apache.spark.sql.DataFrame) =
      df.select("uid", "ts", "event_id", "asof_amt").collect()
        .map(_.toString).sorted.toSeq

    val base = canon(AsofJoin.asofJoin(left, right, Seq("uid"), "ts", Seq("amt")))
    val salted = canon(AsofJoin.asofJoinSkewed(left, right, Seq("uid"), "ts",
      Seq("amt"), buckets = 16))
    assert(salted == base)
    // degenerate bucket counts still agree
    val one = canon(AsofJoin.asofJoinSkewed(left, right, Seq("uid"), "ts",
      Seq("amt"), buckets = 1))
    assert(one == base)
  }

  test("skewed variant: carry-in crosses empty buckets") {
    import spark.implicits._
    // single right row in bucket 0; left rows far later (many empty
    // buckets in between) must still see it
    val left = Seq((1L, 1000000L, 1L), (1L, 999999999L, 2L), (2L, 5000L, 3L))
      .toDF("uid", "ts", "event_id")
    val right = Seq((1L, 10L, 42.0)).toDF("uid", "ts", "amt")
    val got = AsofJoin.asofJoinSkewed(left, right, Seq("uid"), "ts",
      Seq("amt"), buckets = 32)
      .select("event_id", "asof_amt").collect()
      .map(r => r.getLong(0) -> Option(r.get(1))).toMap
    assert(got == Map(1L -> Some(42.0), 2L -> Some(42.0), 3L -> None))
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
