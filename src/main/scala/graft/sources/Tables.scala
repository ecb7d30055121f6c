package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver-generated parquet tables under a scale-factor dir
  * (`/root/testdata/sf*`). All queries go through here so scan-level
  * concerns (schema quirks, derived event-time columns) are centralized.
  *
  * Scale notes: these are plain parquet scans — filters and column pruning
  * push down via Catalyst (`PushedFilters`/`ReadSchema` in explain). On a
  * real cluster the same code reads a partitioned table; nothing here
  * assumes single-file inputs.
  */
object Tables {
  def apply(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame   = apply(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame   = apply(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = apply(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = apply(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame     = apply(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame   = apply(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = apply(s, d, "lineitem")
  def documents(s: SparkSession, d: String): DataFrame  = apply(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = apply(s, d, "embeddings")

  /** `events` with a derived `ts_sec` (epoch seconds, Long).
    *
    * The parquet column is TIMESTAMP(NANOS); with
    * `spark.sql.legacy.parquet.nanosAsLong=true` Spark reads it as an epoch-
    * nanos Long. We derive integral epoch seconds with `div` (exact integer
    * division — a double roundtrip would lose precision above 2^53 ns) so
    * window arithmetic is bit-identical to the DuckDB oracle's
    * `epoch_ms(ts)//1000`.
    */
  def events(s: SparkSession, d: String): DataFrame =
    apply(s, d, "events").withColumn("ts_sec", expr("ts div 1000000000"))

  /** `events` with a proper TimestampType event-time column for the
    * streaming/window()-based operators (micro-second truncation).
    */
  def eventsTimed(s: SparkSession, d: String): DataFrame =
    events(s, d).withColumn("event_time", timestamp_micros(expr("ts div 1000")))
}
