package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import scala.collection.concurrent.TrieMap

/** Message-transport abstraction so sync loops run identically against a
  * Kafka cluster or an in-memory fixture (the reference tests the same way:
  * ztests tagged `kafka` need a broker, the rest do not).
  *
  * Record shape both ways: (topic string, partition long, offset long,
  * key binary, value binary) — Spark's Kafka source columns.
  */
trait Bus {
  /** Bounded read of records with offset >= startOffsets(topic) (0 when
    * absent) for the given topics.
    */
  def readBatch(spark: SparkSession, topics: Seq[String],
      startOffsets: Map[String, Long]): DataFrame

  /** Append records (topic, key, value); returns per-topic write counts. */
  def write(df: DataFrame): Map[String, Long]

  /** Next offset to be produced per topic (end watermark,
    * ref fifo/consumer.go:184-227).
    */
  def endOffsets(spark: SparkSession, topics: Seq[String]): Map[String, Long]
}

object Bus {
  val schema: StructType = StructType(Seq(
    StructField("topic", StringType),
    StructField("partition", LongType),
    StructField("offset", LongType),
    StructField("key", BinaryType),
    StructField("value", BinaryType)))
}

/** Kafka transport via Spark's Kafka source/sink (requires the
  * spark-sql-kafka connector on the classpath at runtime; zero-egress test
  * environments use [[MemoryBus]]).
  *
  * Note the reference pins every topic to one partition for FIFO ordering
  * (fifo/consumer.go:59-62) — we keep that contract for sync topics, so
  * `partition` is the Kafka partition (always 0 under the contract) and
  * offsets are per-topic monotone.
  */
final class KafkaBus(bootstrapServers: String,
    extraOptions: Map[String, String] = Map.empty) extends Bus {

  private def offsetsJson(topics: Seq[String], off: Map[String, Long],
      default: String): String =
    topics.map(t => s""""$t":{"0":${off.get(t).map(_.toString).getOrElse(default)}}""")
      .mkString("{", ",", "}")

  override def readBatch(spark: SparkSession, topics: Seq[String],
      startOffsets: Map[String, Long]): DataFrame = {
    val reader = spark.read.format("kafka")
      .option("kafka.bootstrap.servers", bootstrapServers)
      .option("subscribe", topics.mkString(","))
      .option("startingOffsets", offsetsJson(topics, startOffsets, "-2"))
      .option("endingOffsets", "latest")
    extraOptions.foldLeft(reader) { case (r, (k, v)) => r.option(k, v) }
      .load()
      .select(col("topic"), col("partition").cast("long"),
        col("offset").cast("long"), col("key"), col("value"))
  }

  /** Streaming flavor for FromKafka.stream. */
  def readStream(spark: SparkSession, topics: Seq[String],
      startOffsets: Map[String, Long]): DataFrame = {
    val reader = spark.readStream.format("kafka")
      .option("kafka.bootstrap.servers", bootstrapServers)
      .option("subscribe", topics.mkString(","))
      .option("startingOffsets", offsetsJson(topics, startOffsets, "-2"))
    extraOptions.foldLeft(reader) { case (r, (k, v)) => r.option(k, v) }
      .load()
      .select(col("topic"), col("partition").cast("long"),
        col("offset").cast("long"), col("key"), col("value"))
  }

  override def write(df: DataFrame): Map[String, Long] = {
    df.select(col("topic"), col("key"), col("value"))
      .write.format("kafka")
      .option("kafka.bootstrap.servers", bootstrapServers)
      .save()
    df.groupBy("topic").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
  }

  override def endOffsets(spark: SparkSession, topics: Seq[String]): Map[String, Long] = {
    // batch read of just the metadata is not exposed; read latest offsets by
    // scanning an empty range is wasteful — use the admin client when the
    // kafka-clients jar is present.
    throw new UnsupportedOperationException(
      "KafkaBus.endOffsets needs kafka-clients AdminClient at runtime")
  }
}

/** In-memory transport for tests and local pipelines: per-topic append-only
  * buffers with Kafka offset semantics.
  */
final class MemoryBus extends Bus {
  private val topicsMap = TrieMap.empty[String, scala.collection.mutable.Buffer[(Array[Byte], Array[Byte])]]

  def publish(topic: String, key: Array[Byte], value: Array[Byte]): Long =
    topicsMap.synchronized {
      val buf = topicsMap.getOrElseUpdate(topic, scala.collection.mutable.Buffer.empty)
      buf += ((key, value))
      buf.size.toLong - 1
    }

  override def readBatch(spark: SparkSession, topics: Seq[String],
      startOffsets: Map[String, Long]): DataFrame = {
    val rows = topicsMap.synchronized {
      topics.flatMap { t =>
        val start = startOffsets.getOrElse(t, 0L)
        topicsMap.getOrElse(t, Nil).zipWithIndex.drop(start.toInt).map {
          case ((k, v), i) =>
            org.apache.spark.sql.Row(t, 0L, i.toLong, k, v)
        }
      }
    }
    spark.createDataFrame(spark.sparkContext.parallelize(rows.toSeq, 4), Bus.schema)
  }

  override def write(df: DataFrame): Map[String, Long] = {
    val rows = df.select(col("topic"),
      col("key").cast("binary"), col("value").cast("binary")).collect()
    topicsMap.synchronized {
      rows.foreach(r => publish(r.getString(0),
        r.getAs[Array[Byte]](1), r.getAs[Array[Byte]](2)))
    }
    rows.groupBy(_.getString(0)).view.mapValues(_.length.toLong).toMap
  }

  override def endOffsets(spark: SparkSession, topics: Seq[String]): Map[String, Long] =
    topicsMap.synchronized {
      topics.map(t => t -> topicsMap.get(t).map(_.size.toLong).getOrElse(0L)).toMap
    }
}
