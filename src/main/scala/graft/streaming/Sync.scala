package graft.streaming

import graft.codecs.{ConnectJson, SchemaRegistry, ZAvro}
import graft.lake.Pool
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, StructType}

/** Per-message codec applied at the bus boundary. */
trait EnvelopeCodec extends Serializable {
  def decode(c: Column): Column
  def encode(c: Column): Column
}

/** UTF-8 string payloads (the reference's text formats). */
object RawStringCodec extends EnvelopeCodec {
  override def decode(c: Column): Column = c.cast("string")
  override def encode(c: Column): Column = c.cast("binary")
}

final class ConnectJsonCodec(schema: DataType) extends EnvelopeCodec {
  override def decode(c: Column): Column = ConnectJson.decode(c.cast("string"), schema)
  override def encode(c: Column): Column =
    ConnectJson.encode(c, schema).cast("binary")
}

final class RegistryAvroCodec(schema: StructType, namespace: String,
    registry: SchemaRegistry) extends EnvelopeCodec {
  override def decode(c: Column): Column = ZAvro.decodeColumn(c, schema, registry)
  override def encode(c: Column): Column = ZAvro.encodeColumn(c, schema, namespace, registry)
}

/** Kafka → pool sync (ref: cmd/zync/from-kafka/command.go:86-301).
  *
  * Batch flavor: one call = consume-available → decode → envelope →
  * optional shaper → one atomic pool commit, with start offsets recovered
  * from the pool itself (`tail 1`-per-topic semantics, fifo/lake.go:62-82) —
  * so a crashed sync resumes exactly where the last commit left off,
  * independent of consumer-group state.
  *
  * Scale: decode + envelope are per-row expressions; the pool append is the
  * only materialization. For continuous operation `stream` wires the same
  * stages into foreachBatch with Spark checkpointing on top.
  */
final class FromKafka(bus: Bus, keyCodec: EnvelopeCodec, valueCodec: EnvelopeCodec,
    shaper: Option[DataFrame => DataFrame] = None) {

  /** Recover per-topic resume offsets from the pool: max(kafka.offset)+1. */
  def resumeOffsets(pool: Pool, topics: Seq[String]): Map[String, Long] = {
    if (pool.isEmpty) Map.empty
    else pool.read()
      .filter(col("kafka.topic").isin(topics: _*))
      .groupBy(col("kafka.topic")).agg(max(col("kafka.offset")).as("m"))
      .collect().map(r => r.getString(0) -> (r.getLong(1) + 1L)).toMap
  }

  def envelope(records: DataFrame): DataFrame = {
    val env = records.select(
      struct(col("topic"), col("partition"), col("offset")).as("kafka"),
      keyCodec.decode(col("key")).as("key"),
      valueCodec.decode(col("value")).as("value"))
    shaper.map(f => f(env)).getOrElse(env)
  }

  /** One bounded sync pass; returns records committed. */
  def syncOnce(spark: SparkSession, topics: Seq[String], pool: Pool): Long = {
    val start = resumeOffsets(pool, topics)
    val batch = bus.readBatch(spark, topics, start)
    val env = envelope(batch).cache()
    try {
      val n = env.count()
      if (n > 0) pool.append(env)
      n
    } finally env.unpersist()
  }

  /** Continuous sync from any streaming source with Bus.schema columns:
    * decode/envelope/shape run inside foreachBatch, each micro-batch lands
    * as one atomic pool commit (the reference's thresh/interval
    * micro-batching maps to trigger + maxOffsetsPerTrigger).
    */
  def streamFrom(records: DataFrame, pool: Pool,
      checkpoint: String): org.apache.spark.sql.streaming.StreamingQuery =
    records.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val env = envelope(batch)
        if (!env.isEmpty) { pool.append(env); () }
      }
      .start()

  /** Kafka flavor of [[streamFrom]] with pool-recovered start offsets. */
  def stream(spark: SparkSession, kafka: KafkaBus, topics: Seq[String], pool: Pool,
      checkpoint: String): org.apache.spark.sql.streaming.StreamingQuery =
    streamFrom(kafka.readStream(spark, topics, resumeOffsets(pool, topics)),
      pool, checkpoint)

  /** Topic→pool fan-out: one bounded sync per pool over its topics
    * (ref: cmd/zync/from-kafka/command.go:93-119 poolToTopics routing +
    * :150-215 per-pool loaders). Sequential here; in production each pool
    * runs as its own streaming query.
    */
  def syncRoutes(spark: SparkSession,
      routes: Seq[(Pool, Seq[String])]): Map[String, Long] =
    routes.map { case (pool, topics) =>
      pool.name -> syncOnce(spark, topics, pool)
    }.toMap
}

/** Pool → Kafka sync (ref: fifo/to.go:31-55, BatchSize=200 fifo/to.go:29).
  *
  * Resumes from the producer high-water mark: records with
  * kafka.offset >= (end offset of the target topic) have not been produced
  * yet — the same lake-vs-broker cursor comparison the reference makes.
  */
final class ToKafka(bus: Bus, keyCodec: EnvelopeCodec, valueCodec: EnvelopeCodec,
    batchSize: Int = 200) {

  def syncOnce(spark: SparkSession, pool: Pool, topic: String): Long = {
    var produced = 0L
    var cursor = bus.endOffsets(spark, Seq(topic)).getOrElse(topic, 0L)
    var continue = true
    while (continue) {
      val batch = pool.read()
        .filter(col("kafka.topic") === topic && col("kafka.offset") >= cursor &&
          col("_type").isNull)
        .orderBy(col("kafka.offset"))
        .limit(batchSize)
        .cache()
      try {
        val n = batch.count()
        if (n == 0) continue = false
        else {
          bus.write(batch.select(
            col("kafka.topic").as("topic"),
            keyCodec.encode(col("key")).as("key"),
            valueCodec.encode(col("value")).as("value")))
          cursor += n
          produced += n
        }
      } finally batch.unpersist()
    }
    produced
  }
}
