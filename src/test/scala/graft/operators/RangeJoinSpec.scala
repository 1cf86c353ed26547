package graft.operators

import graft.GraftSession
import org.scalatest.funsuite.AnyFunSuite

class RangeJoinSpec extends AnyFunSuite {

  lazy val spark = GraftSession.local(4)

  test("containment semantics: half-open, per key, chunk-spanning intervals") {
    import spark.implicits._
    val events = Seq((1L, 1L, 5L), (2L, 1L, 10L), (3L, 1L, 20L), (4L, 2L, 5L))
      .toDF("event_id", "uid", "ts")
    // interval (1, [4, 12)) spans chunks when chunk=8; (1, [12, 12)) empty
    val iv = Seq((1L, 4L, 12L), (1L, 15L, 25L), (1L, 12L, 12L), (3L, 0L, 100L))
      .toDF("uid", "s", "e")
    val got = RangeJoin.rangeJoin(events, iv, Seq("uid"), "ts", "s", "e",
      chunkSize = Some(8L))
      .select("event_id", "s").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((1L, 4L), (2L, 4L), (3L, 15L)))
    // default chunk (max interval length) gives the same answer
    val auto = RangeJoin.rangeJoin(events, iv, Seq("uid"), "ts", "s", "e")
      .select("event_id", "s").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(auto == got)
  }

  test("non-positive chunk is rejected; int-typed interval columns work") {
    import spark.implicits._
    val events = Seq((1L, 1L, 5L)).toDF("event_id", "uid", "ts")
    val iv = Seq((1L, 4L, 12L)).toDF("uid", "s", "e")
    intercept[IllegalArgumentException] {
      RangeJoin.rangeJoin(events, iv, Seq("uid"), "ts", "s", "e", Some(0L))
    }
    // integer interval columns must not ClassCastException in the
    // default-chunk aggregate
    val evInt = Seq((1L, 1, 5)).toDF("event_id", "uid", "ts")
    val ivInt = Seq((1, 4, 12)).toDF("uid", "s", "e")
    assert(RangeJoin.rangeJoin(evInt, ivInt, Seq("uid"), "ts", "s", "e")
      .count() == 1)
  }

  test("plans as a hash join, not a nested loop") {
    import spark.implicits._
    val events = (1L to 200L).map(i => (i, i % 5, i)).toDF("event_id", "uid", "ts")
    val iv = (0L to 40L).map(i => (i % 5, i * 5, i * 5 + 5)).toDF("uid", "s", "e")
    val plan = RangeJoin.rangeJoin(events, iv, Seq("uid"), "ts", "s", "e")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("NestedLoop") && !plan.contains("CartesianProduct"), plan)
  }
}
