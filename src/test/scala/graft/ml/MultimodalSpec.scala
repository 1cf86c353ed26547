package graft.ml

import graft.GraftSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class MultimodalSpec extends AnyFunSuite {

  lazy val spark = GraftSession.local(4)
  val dir = "/root/testdata/sf0.001"

  test("resize stub: deterministic strided sample to target size") {
    val payload = (0 until 100).map(_.toByte).toArray
    val r = MultimodalOps.resizeStub(payload, 10)
    assert(r.length == 10)
    assert(r.toSeq == (0 until 100 by 10).map(_.toByte))
    // already-small payloads pass through untouched
    assert(MultimodalOps.resizeStub(payload, 200) eq payload)
    assert(MultimodalOps.resizeStub(null, 10) == null)
  }

  test("frames partition the payload exactly (no byte lost or duplicated)") {
    val frames = MultimodalOps.sampleFrames(
      MultimodalOps.assets(spark, dir), 4)
    // per asset: 4 frames whose sizes sum to the payload size
    val bad = frames.groupBy("asset_id")
      .agg(count(lit(1)).as("n"), sum("f_bytes").as("total"))
      .join(MultimodalOps.assets(spark, dir)
        .select(col("asset_id"), col("meta.n_bytes")), Seq("asset_id"))
      .filter(col("n") =!= 4 || col("total") =!= col("n_bytes"))
    assert(bad.isEmpty, bad.take(3).mkString(","))
    // frames re-concatenate to the original payload (order restored
    // inside the aggregate — collect_list has no ordering guarantee)
    val rejoined = frames
      .groupBy("asset_id")
      .agg(md5(concat_ws("", transform(
        array_sort(collect_list(struct(col("frame_idx"), col("frame").cast("string").as("s")))),
        x => x.getField("s")))).as("fp"))
    val orig = MultimodalOps.assets(spark, dir)
      .select(col("asset_id"), md5(col("payload").cast("string")).as("fp0"))
    assert(rejoined.join(orig, Seq("asset_id"))
      .filter(col("fp") =!= col("fp0")).isEmpty)
  }
}
