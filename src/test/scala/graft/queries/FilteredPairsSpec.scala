package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Per-request filtered serving: a (query_id, vec_id) pairs frame must
  * act as each query's OWN eligibility relation — two same-batch
  * queries with different (here: disjoint) keep sets, where one
  * query's top candidate is the other's excluded id. Pinned against
  * the one-query-at-a-time ground truth: serving query q with pairs
  * must equal serving q ALONE with its keep set as a corpus-global
  * keepIds filter, for both the cascade and the IVF-PQ funnel.
  */
class FilteredPairsSpec extends SparkSpec {

  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  private def tmp(p: String) = java.nio.file.Files.createTempDirectory(p).toString

  private lazy val corpus = graft.sources.Tables.embeddings(spark, sf)

  private lazy val queries = corpus.filter($"vec_id" < 4L)
    .select($"vec_id".as("query_id"), $"embedding")

  /** query q sees only candidates with vec_id % 2 == q % 2. */
  private lazy val parityPairs = queries
    .select($"query_id", ($"query_id" % 2).as("par"))
    .join(corpus.select($"vec_id", ($"vec_id" % 2).as("par")), Seq("par"))
    .select($"query_id", $"vec_id")

  private def keepFor(q: Long): DataFrame =
    corpus.select($"vec_id").filter($"vec_id" % 2 === q % 2)

  private def rows(df: DataFrame): Set[(Long, Long, Long)] =
    df.select($"query_id", $"cand_id", $"rnk")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

  test("cascade: per-request pairs equal per-query keepIds runs; exclusions are per query") {
    val bq = tmp("fp-bq"); val sq = tmp("fp-sq8")
    VectorOps.writeBqIndex(corpus, bq)
    VectorOps.writeSq8Index(corpus, sq)

    val batched = rows(VectorOps.searchCascadeIndex(
      queries, bq, sq, corpus, excludeSelf = true, keepPairs = Some(parityPairs)))

    // ground truth: each query served ALONE under its keep set as a
    // corpus-global filter — the pairs batch must reproduce all four
    val oneByOne = (0L until 4L).flatMap { q =>
      rows(VectorOps.searchCascadeIndex(
        queries.filter($"query_id" === q), bq, sq, corpus,
        excludeSelf = true, keepIds = Some(keepFor(q))))
    }.toSet
    assert(batched === oneByOne,
      "batched per-request filtering must equal the per-query filtered serves")

    // the adversarial shape: disjoint keep sets in ONE batch — every
    // result respects its own query's parity, and query 0's top
    // candidate is precisely an id query 1 may never be served
    val byQuery = batched.groupBy(_._1)
    (0L until 4L).foreach { q =>
      assert(byQuery(q).forall { case (_, cand, _) => cand % 2 == q % 2 },
        s"query $q leaked a candidate outside its keep set")
    }
    val top0 = byQuery(0L).minBy(_._3)._2
    assert(top0 % 2 == 0 && !byQuery(1L).exists(_._2 == top0),
      "query 0's top candidate must be query 1's excluded id")

    // an unfiltered serve DOES cross the parity line (the fixture is
    // non-degenerate: the filter is doing real work)
    val unfiltered = rows(VectorOps.searchCascadeIndex(
      queries, bq, sq, corpus, excludeSelf = true))
    assert(unfiltered.exists { case (q, cand, _) => cand % 2 != q % 2 })
  }

  test("ivf-pq funnel: per-request pairs equal per-query keepIds runs") {
    val dir = tmp("fp-ivfpq")
    VectorOps.writeIvfPqIndex(corpus, dir)
    val batched = rows(VectorOps.searchIvfPqRefined(
      spark, dir, queries, corpus, excludeSelf = true,
      keepPairs = Some(parityPairs)))
    val oneByOne = (0L until 4L).flatMap { q =>
      rows(VectorOps.searchIvfPqRefined(
        spark, dir, queries.filter($"query_id" === q), corpus,
        excludeSelf = true, keepIds = Some(keepFor(q))))
    }.toSet
    assert(batched === oneByOne)
    assert(batched.forall { case (q, cand, _) => cand % 2 == q % 2 })
  }

  test("bq 2-tier: pairs compose WITH a corpus-global keepIds (both filters apply)") {
    val bq = tmp("fp-bq2")
    VectorOps.writeBqIndex(corpus, bq)
    // global: only ids < 40; per-request: own parity — the serve must
    // honor the INTERSECTION per query
    val global = corpus.select($"vec_id").filter($"vec_id" < 40L)
    val got = rows(VectorOps.searchBqIndex(
      queries, bq, corpus, excludeSelf = true,
      keepIds = Some(global), keepPairs = Some(parityPairs)))
    assert(got.nonEmpty)
    assert(got.forall { case (q, cand, _) => cand < 40L && cand % 2 == q % 2 })
  }
}
