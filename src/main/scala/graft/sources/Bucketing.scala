package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed-table support — the co-located-join scale path (SURVEY §4,
  * build contract "repartition/bucketing for co-located joins").
  *
  * A fact-fact join (lineitem ⋈ orders on orderkey) shuffles BOTH sides
  * every query. Bucketing both tables by the join key at write time makes
  * the join shuffle-free forever after: each bucket pair joins locally, and
  * at 100 TB that deletes the dominant network cost of every orderkey join.
  * The same applies to repeated aggregations on the bucket key.
  *
  * Bucketed writes go through the session catalog (`saveAsTable` — plain
  * `parquet(path)` cannot record bucket metadata).
  */
object Bucketing {

  /** Writes `df` as a bucketed, sorted parquet table in the session
    * catalog. `sortBy` the same key gives sort-merge joins without the
    * sort step either.
    */
  def writeBucketed(
      df: DataFrame,
      table: String,
      bucketCol: String,
      numBuckets: Int,
  ): Unit =
    df.write
      .mode(SaveMode.Overwrite)
      .bucketBy(numBuckets, bucketCol)
      .sortBy(bucketCol)
      .format("parquet")
      .saveAsTable(table)

  /** Bucket-and-register the orderkey-join tables for a scale-factor dir:
    * `lineitem_b` and `orders_b`, both bucketed on the order key so
    * lineitem⋈orders plans skip both exchanges.
    */
  def bucketOrderJoinTables(spark: SparkSession, dir: String, numBuckets: Int = 32): Unit = {
    writeBucketed(Tables.lineitem(spark, dir), "lineitem_b", "l_orderkey", numBuckets)
    writeBucketed(Tables.orders(spark, dir), "orders_b", "o_orderkey", numBuckets)
  }
}
