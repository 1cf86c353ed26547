package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

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

  /** events.ts is read as LongType ns-since-epoch (nanosAsLong); convert to a
    * µs-precision timestamp the way DuckDB's ns→µs cast does (truncation).
    * Decimal division: ns values (~1.7e18) exceed double's 2^53 exact range,
    * so `/` (double division) would corrupt the low microseconds.
    */
  def eventTime(tsNanos: Column): Column =
    timestamp_micros((tsNanos.cast("decimal(38,0)") / 1000).cast("long"))

  /** events.ts as µs-since-epoch longs for oracle-compared arithmetic:
    * DuckDB's parquet reader surfaces µs precision, so comparing at ns
    * would fabricate trailing zeros on the oracle side and diverge.
    */
  def eventMicros(tsNanos: Column): Column =
    (tsNanos.cast("decimal(38,0)") / 1000).cast("long")
}
