package graft

import org.apache.spark.sql.functions._

/** Dev tool: decomposes the q_etl_stateless BUILD phase (DataFrame
  * construction — the dominant wall-time term on sync-sized batches, see
  * QueryProfile) into its driver-side components, so "driver overhead"
  * stops being one opaque number. Pure measurement; no assertions.
  */
object EtlBuildProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val runs = if (args.length > 1) args(1).toInt else 5
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.builder(s"local[$cpus]", cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val yaml =
      """inputs:
        |  - topic: purchase
        |    pool: Raw
        |output:
        |  topic: Out
        |  pool: Staging
        |transforms:
        |  - type: stateless
        |    where: value.v > 100
        |    in: purchase
        |    out: Out
        |    zed: |
        |      | out:={ key: in.key, value: { amount: in.value.v } }
        |  - type: stateless
        |    in: purchase
        |    out: Out2
        |    zed: |
        |      | out:={ key: in.key, value: { amount: in.value.v } }
        |""".stripMargin

    def t[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val a = f; (a, (System.nanoTime() - t0) / 1e9)
    }
    for (r <- 1 to runs) {
      val (tr, tYaml) = t(graft.etl.Transform.fromYaml(yaml))
      val (program, tCompile) = t(graft.etl.Compiler.compile(tr))
      val (input, tIn) = t {
        graft.sources.Tables.events(spark, sfDir).select(
          struct(col("event_type").as("topic"), col("event_id").cast("long").as("offset"))
            .as("kafka"),
          struct(col("user_id").as("user")).as("key"),
          struct(col("value").as("v"),
            get_json_object(col("props"), "$.k").cast("long").as("k")).as("value"))
      }
      val (doneSet, tDone) = t {
        graft.sources.Tables.events(spark, sfDir)
          .filter(col("event_type") === "purchase" && col("event_id") % 3 === 0)
          .select(col("event_type").as("topic"), col("event_id").cast("long").as("offset"))
      }
      val (span, tSpan) = t {
        val row = graft.sources.Tables.events(spark, sfDir)
          .agg(min(col("event_id")).cast("long"), max(col("event_id")).cast("long")).head()
        row.getLong(1) - row.getLong(0) + 1L
      }
      val (out, tRun) = t(program.run(input, doneSet, Map("Out" -> 1000L),
        batchSpanHint = Some(span)))
      val (_, tFlatten) = t {
        out.select(col("key.user").as("key_user"), col("value.amount").as("amount"),
          col("kafka.topic").as("topic"), col("kafka.offset").as("offset"), col("_type"))
      }
      println(f"== run $r: yaml $tYaml%.3f compile $tCompile%.3f input $tIn%.3f " +
        f"done $tDone%.3f span $tSpan%.3f programRun $tRun%.3f flatten $tFlatten%.3f")
    }
    spark.stop()
  }
}
