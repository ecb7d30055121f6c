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

  /** `embeddings` with the vector column pinned to array<float> — the type
    * the codegen'd dot_d kernel requires. The cast is a no-op while the
    * generator ships float32 (Catalyst folds the redundant cast away) and
    * insurance against a regen shipping float64, which would otherwise
    * fail every vector query at analysis — the same breakage class as the
    * events `ts` type change this guard's sibling above absorbs.
    */
  def embeddings(s: SparkSession, d: String): DataFrame =
    apply(s, d, "embeddings")
      .withColumn("embedding", col("embedding").cast("array<float>"))

  /** `events` with a derived `ts_sec` (epoch seconds, Long).
    *
    * The generator has shipped the `ts` column two ways: TIMESTAMP(NANOS)
    * (read as an epoch-nanos Long under
    * `spark.sql.legacy.parquet.nanosAsLong=true`) and plain TIMESTAMP(MICROS)
    * (read as TimestampType). Both derivations use exact integer division —
    * a double roundtrip would lose precision above 2^53 — so window
    * arithmetic stays bit-identical to the DuckDB oracle's
    * `epoch_ms(ts)//1000`. Raw `ts` is kept only for intra-key ordering
    * (both readings order identically).
    */
  def events(s: SparkSession, d: String): DataFrame = {
    val raw = apply(s, d, "events")
    // TIMESTAMP_NTZ casts to TimestampType through the session zone (pinned
    // UTC in GraftSession), so unix_micros sees the same wall-clock epoch
    // DuckDB's naive epoch_ms(ts) computes.
    val tsSec = raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType => expr("ts div 1000000000")
      case _ => expr("unix_micros(cast(ts as timestamp)) div 1000000")
    }
    raw.withColumn("ts_sec", tsSec)
  }

  /** `events` with a proper TimestampType event-time column for the
    * streaming/window()-based operators (micro-second truncation).
    */
  def eventsTimed(s: SparkSession, d: String): DataFrame = {
    val withSec = events(s, d)
    val et = withSec.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType => timestamp_micros(expr("ts div 1000"))
      case _                                   => col("ts").cast("timestamp")
    }
    withSec.withColumn("event_time", et)
  }
}
