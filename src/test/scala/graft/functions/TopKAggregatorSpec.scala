package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.Windowed
import graft.sources.Fixtures

class TopKAggregatorSpec extends SparkSpec {

  test("heap top-K equals the rank-over-window formulation on hot items") {
    import spark.implicits._
    val behaviors = Fixtures.userBehavior(
      spark, s"$refBase/HotItemsAnalysis/src/main/resources/UserBehaviorTest.csv")
    // shared aggregate: (windowEnd, itemId, cnt)
    val counted = Windowed
      .hotItems(behaviors, topN = Int.MaxValue)
      .select($"windowEnd", $"itemId", $"cnt")

    val viaRank = counted
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy($"windowEnd").orderBy($"cnt".desc, $"itemId")))
      .filter($"rn" <= 3)
      .select($"windowEnd", $"itemId", $"cnt")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .toSet

    val topK = new TopKAggregator(3).toColumn
    val viaHeap = counted
      .select($"windowEnd", struct($"itemId".as("key"), $"cnt").as("scored"))
      .as[(Long, Scored)]
      .groupByKey(_._1)
      .mapValues(_._2)
      .agg(topK.name("top"))
      .flatMap { case (we, top) => top.map(s => (we, s.key, s.cnt)) }
      .collect()
      .toSet

    assert(viaHeap === viaRank)
    assert(viaHeap.nonEmpty)
  }

  test("merge keeps the bound and ordering across many partitions") {
    import spark.implicits._
    // one row per key spread over 40 partitions (the aggregator's input
    // contract is pre-aggregated (key, cnt) rows), count weight = key
    val rows = spark.range(0, 100, 1, 40)
      .select(lit(1L).as("w"), struct(col("id").as("key"), col("id").as("cnt")).as("s"))
      .as[(Long, Scored)]
    val got = rows
      .groupByKey(_._1)
      .mapValues(_._2)
      .agg(new TopKAggregator(5).toColumn.name("top"))
      .collect()
      .head._2
    // highest cnt wins; ties by smaller key — keys 99..95 with cnt 99..95
    assert(got.map(_.key) === Seq(99L, 98L, 97L, 96L, 95L))
    assert(got.size === 5)
  }

  test("exact-duplicate pairs are idempotent: redelivery cannot seat a key twice") {
    val agg = new TopKAggregator(3)
    val once = Seq(Scored(1L, 9L), Scored(2L, 8L), Scored(3L, 7L), Scored(4L, 6L))
      .foldLeft(agg.zero)(agg.reduce)
    // redeliver every element (the at-least-once stream shape): the
    // resident pairs no-op, the evicted one re-offers as worse-than-last
    val twice = Seq(Scored(1L, 9L), Scored(2L, 8L), Scored(3L, 7L), Scored(4L, 6L))
      .foldLeft(once)(agg.reduce)
    assert(twice === once)
    assert(once.map(_.key) === Seq(1L, 2L, 3L))
    // merge with a partial that saw the same elements: also unchanged
    val partial = Seq(Scored(2L, 8L), Scored(4L, 6L)).foldLeft(agg.zero)(agg.reduce)
    assert(agg.merge(once, partial) === once)
    // same key at a DIFFERENT score still inserts (caller's contract)
    assert(agg.reduce(once, Scored(2L, 9L)).count(_.key == 2L) === 2)
  }
}
