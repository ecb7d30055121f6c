package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SkewSpec extends SparkSpec {

  test("saltedDistinctCount is exact and matches countDistinct") {
    import spark.implicits._
    // hot key: one key holds 90% of rows
    val df = spark.range(100000)
      .select(
        when(col("id") % 10 =!= 0, lit("hot")).otherwise(lit("cold")).as("k"),
        (col("id") % 7001).as("v"))
    val salted = Skew.saltedDistinctCount(df, Seq(col("k")), col("v"), buckets = 16)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = df.groupBy("k").agg(countDistinct("v").as("d"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(salted === exact)
  }

  test("saltedJoin returns the same rows as a plain join") {
    import spark.implicits._
    val left = spark.range(5000).select((col("id") % 3).as("k"), col("id").as("lv"))
    val right = Seq((0L, "a"), (1L, "b"), (2L, "c")).toDF("k", "rv")
    val plain = left.join(right, "k").select("lv", "rv").collect().toSet
    val salted = Skew.saltedJoin(left, right, "k", buckets = 4)
      .select("lv", "rv").collect().toSet
    assert(salted === plain)
  }
}
