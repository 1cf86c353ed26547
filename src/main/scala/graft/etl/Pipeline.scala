package graft.etl

import graft.lake.Pool
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Runs a compiled ETL transform between pools with exactly-once,
  * restartable semantics (ref: etl/pipeline.go:27-125).
  *
  * One run: scan input pool → anti-join the output pool's done records →
  * apply rules → renumber offsets from the output pool's high-water mark →
  * single atomic append (data + done rows together — the transactional
  * consistency trick of the reference design).
  */
final class Pipeline(spark: SparkSession, transform: Transform, root: String) {

  Transform.validate(transform)

  private val inputPoolNames = transform.inputs.map(_.pool).distinct
  require(inputPoolNames.size == 1,
    "all input topics must route through one pool (matches reference constraint)")

  val inputPool: Pool = Pool.open(spark, root, inputPoolNames.head)
  val outputPool: Pool = Pool.create(spark, root, transform.output.pool)

  private val program = Compiler.compile(transform)

  /** Returns number of records written (data + done). */
  def run(): Long = {
    val in = inputPool.read()
    if (in.columns.isEmpty) return 0L

    val dataIn =
      if (in.columns.contains(Compiler.TypeCol)) in.filter(col(Compiler.TypeCol).isNull)
      else in

    val doneSet: DataFrame = {
      val out = outputPool.read()
      if (out.columns.isEmpty || !out.columns.contains(Compiler.TypeCol))
        spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
          org.apache.spark.sql.types.StructType(Seq(
            org.apache.spark.sql.types.StructField("topic",
              org.apache.spark.sql.types.StringType),
            org.apache.spark.sql.types.StructField("offset",
              org.apache.spark.sql.types.LongType))))
      else out.filter(col(Compiler.TypeCol) === Compiler.Done)
        .select(col("kafka.topic").as("topic"), col("kafka.offset").as("offset"))
    }

    // Cursor range-limiting — designed but never implemented in the
    // reference (etl/build.go:9-18, design.md:1-7): per topic, compute the
    // largest done-offset prefix that is CONTIGUOUS from the topic's first
    // input offset; everything at or below that cursor is provably
    // processed, so the input scan can skip it (the filter pushes into
    // parquet min/max pruning — at scale, incremental runs read only new
    // files). The anti-join still covers out-of-order gaps above the
    // cursor, so this is purely a scan reduction, never a correctness
    // change.
    // Tiny per-topic metadata queries (same pattern as the reference's
    // NextProducerOffsets) whose results inline as LITERAL predicates —
    // that's what lets Catalyst push them into parquet min/max pruning.
    val cursorMap: Map[String, Long] = {
      val mins = dataIn.groupBy(col("kafka.topic").as("topic"))
        .agg(min("kafka.offset").as("base"))
      val w = Window.partitionBy("topic").orderBy("offset")
      doneSet.join(mins, Seq("topic"))
        .withColumn("rn", row_number().over(w))
        .filter(col("offset") === col("base") + col("rn") - 1)
        .groupBy("topic").agg(max("offset").as("cursor"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    }
    val prunedIn = cursorMap.foldLeft(dataIn) { case (df, (t, c)) =>
      df.filter(!(col("kafka.topic") === t && col("kafka.offset") <= c))
    }
    val prunedDone = cursorMap.foldLeft(doneSet) { case (df, (t, c)) =>
      df.filter(!(col("topic") === t && col("offset") <= c))
    }

    val bases = outputPool.nextProducerOffsets()
    val result = program.run(prunedIn, prunedDone, bases).cache()
    try {
      val n = result.count()
      if (n > 0) outputPool.append(result)
      n
    } finally result.unpersist()
  }
}
