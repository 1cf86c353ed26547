package graft.etl

import graft.lake.Pool
import org.apache.spark.sql.{DataFrame, SparkSession}
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

    val bases = outputPool.nextProducerOffsets()
    val result = program.run(dataIn, doneSet, bases).cache()
    try {
      val n = result.count()
      if (n > 0) outputPool.append(result)
      n
    } finally result.unpersist()
  }
}
