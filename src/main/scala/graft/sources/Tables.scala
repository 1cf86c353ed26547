package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Loaders for the driver-generated parquet tables.
  *
  * Every query takes a scale-factor directory so the same code runs at
  * sf0.001 (smoke), sf0.01 (correctness), sf0.1 (bench) and, unchanged,
  * against a 100 TB lake: `spark.read.parquet` scans are split by
  * `spark.sql.files.maxPartitionBytes` regardless of file count, and
  * filters/projections land in the scan via Catalyst pushdown.
  */
object Tables {
  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame   = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame   = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame     = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame   = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = table(s, d, "lineitem")
  def events(s: SparkSession, d: String): DataFrame   = table(s, d, "events")
  // NOTE on scan parallelism: parquet scans split by ROW GROUP, not by
  // `maxPartitionBytes` — a single-file table written with huge row groups
  // (duckdb's 122,880-row default swallows these corpora whole) runs every
  // narrow stage above it on one task no matter the core count. That is a
  // test-DATA artifact, not an engine concern: a blanket repartition here
  // would put a full-text shuffle into plans that are correctly shuffle-free
  // at 100 TB (PlanAuditSpec pins those shapes). tools/gen_sf1.py writes
  // scale-run fixtures with small row groups instead.
  def documents(s: SparkSession, d: String): DataFrame  = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")

  /** events.ts as a µs-precision TIMESTAMP, whatever physical type the
    * parquet writer chose. The driver has shipped the column as both
    * int64 ns-since-epoch (read as LongType under `nanosAsLong`) and
    * parquet timestamp[us] (read as TIMESTAMP_NTZ); dispatch on the
    * actual schema so a regenerated dataset can't silently break every
    * time-based gate. Session timezone is pinned to UTC (GraftSession),
    * so the NTZ→LTZ cast is epoch-preserving — the same instant DuckDB's
    * naive-timestamp reader sees.
    *
    * ns path uses decimal division: ns values (~1.7e18) exceed double's
    * 2^53 exact range, so `/` (double division) would corrupt the low
    * microseconds. Truncation matches DuckDB's ns→µs cast.
    */
  def eventTime(df: DataFrame, c: String): Column = df.schema(c).dataType match {
    case LongType          => timestamp_micros((df(c).cast("decimal(38,0)") / 1000).cast("long"))
    case TimestampNTZType  => df(c).cast(TimestampType)
    case TimestampType     => df(c)
    case dt => throw new IllegalArgumentException(
      s"unsupported event-time type for $c: $dt")
  }

  /** events.ts as µs-since-epoch longs for oracle-compared arithmetic:
    * DuckDB's parquet reader surfaces µs precision (`epoch_us`), so this
    * must land on exactly the same integers regardless of physical type.
    */
  def eventMicros(df: DataFrame, c: String): Column = df.schema(c).dataType match {
    case LongType => (df(c).cast("decimal(38,0)") / 1000).cast("long")
    case TimestampNTZType | TimestampType => unix_micros(df(c).cast(TimestampType))
    case dt => throw new IllegalArgumentException(
      s"unsupported event-time type for $c: $dt")
  }
}
