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

  test("keepPairsFrom: a stored-attribute predicate builds the pairs relation declaratively") {
    import graft.sources.Tables
    val docs = Tables.documents(spark, sf)
      .select($"doc_id".as("vec_id"), $"lang")
    // two same-batch requests constrained to DIFFERENT languages — the
    // per-request predicate form of the disjoint-keep-sets case
    val langs = docs.select($"lang").distinct().collect().map(_.getString(0)).sorted
    assume(langs.size >= 2, "fixture needs two languages")
    val reqs = queries.limit(2).collect().zip(langs.take(2)).map {
      case (r, l) => (r.getLong(0), r.getSeq[Float](1).toArray, l)
    }.toSeq
    val reqDf = spark.createDataset(reqs).toDF("query_id", "embedding", "req_lang")

    val pairs = VectorOps.keepPairsFrom(
      reqDf, docs, docs("lang") === reqDf("req_lang"))
    // equi-condition => hash join, and the embedding never reaches it
    val plan = pairs.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"an attribute equi-predicate must plan as a keyed join:\n$plan")
    assert(!plan.contains("embedding"),
      "the request embeddings must be pruned out of the relation build")

    // and the relation is exactly each request's language slice
    val got = pairs.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val expected = reqs.flatMap { case (q, _, l) =>
      docs.filter($"lang" === l).collect().map(r => (q, r.getLong(0)))
    }.toSet
    assert(got === expected)

    // end to end: the built relation drives the cascade like any pairs frame
    val bq = tmp("fp-attr-bq"); val sq = tmp("fp-attr-sq8")
    VectorOps.writeBqIndex(corpus, bq)
    VectorOps.writeSq8Index(corpus, sq)
    val served = rows(VectorOps.searchCascadeIndex(
      reqDf.select($"query_id", $"embedding"), bq, sq, corpus,
      excludeSelf = true, keepPairs = Some(pairs)))
    val langOf = docs.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val reqLang = reqs.map { case (q, _, l) => q -> l }.toMap
    assert(served.nonEmpty)
    assert(served.forall { case (q, cand, _) => langOf(cand) == reqLang(q) },
      "every served candidate must satisfy ITS OWN request's attribute predicate")
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

  test("a non-distinct pairs relation serves each pair ONCE on both funnels") {
    // direct callers can hand a history-table-shaped relation (several
    // rows per pair); the screen must dedup it — a duplicated pair used
    // to rank its candidate twice on the bq path, consuming screen
    // slots and emitting duplicate served rows (the ivfPq left_semi was
    // naturally immune, so the two funnels silently diverged)
    val bq = tmp("fp-dup-bq"); val sq = tmp("fp-dup-sq8")
    VectorOps.writeBqIndex(corpus, bq)
    VectorOps.writeSq8Index(corpus, sq)
    val doubled = parityPairs.unionAll(parityPairs)
    val clean = rows(VectorOps.searchCascadeIndex(
      queries, bq, sq, corpus, excludeSelf = true, keepPairs = Some(parityPairs)))
    val doubledRows = rows(VectorOps.searchCascadeIndex(
      queries, bq, sq, corpus, excludeSelf = true, keepPairs = Some(doubled)))
    assert(doubledRows === clean,
      "duplicated pairs must not double-serve or consume screen slots")
  }

  test("batched hybrid: a STANDING pairs relation wider than the batch serves only the batch") {
    import graft.sources.{Scratch, Tables}
    val docsDf = Tables.documents(spark, sf).select($"doc_id", $"text")
    val pdir = Scratch.cached(s"fps-hyb-post:$sf", "fps-hyb-post") { p =>
      SearchOps.writePostingsIndex(docsDf, p)
    }
    val vdir = Scratch.cached(s"fps-hyb-ivfpq:$sf", "fps-hyb-ivfpq") { p =>
      VectorOps.writeIvfPqIndex(corpus, p)
    }
    val terms = Seq("spark", "join", "window")
    val batch = queries.filter($"query_id" < 2L) // requests 0 and 1 only
    // the deployment shape: a relation covering query_ids the batch
    // never issued (0..3 here) — the serve must not emit rows for them
    val standing = parityPairs.select($"query_id", $"vec_id".as("doc_id"))
    val served = SearchOps.hybridSearchBatchFromIndexes(
      spark, pdir, vdir, terms, batch, 10, keepPairs = standing,
      excludeSelf = false)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(3), r.getLong(5)))
    assert(served.nonEmpty)
    assert(served.map(_._1).toSet === Set(0L, 1L),
      "a standing relation's absent query_ids must not be served")
    // and the wide relation serves identically to one pre-restricted
    // to the batch (the semi-join is a no-op beyond boundedness)
    val restricted = SearchOps.hybridSearchBatchFromIndexes(
      spark, pdir, vdir, terms, batch, 10,
      keepPairs = standing.filter($"query_id" < 2L), excludeSelf = false)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(3), r.getLong(5)))
    assert(served.toSet === restricted.toSet)
    // serving semantics: request 0's own id is an eligible candidate
    // (excludeSelf = false) — its dense top-1 is its stored twin, so
    // (0, 0) must appear WITH a dense rank. Self-exclusion is a DENSE
    // contract only (docs have no self notion on the sparse leg), so
    // the panel-default assertion is on rank_dense, not fused absence:
    // doc 0 may legitimately reach the fuse through BM25 alone.
    val self = served.filter(r => r._1 == 0L && r._2 == 0L)
    assert(self.nonEmpty && self.forall(_._3 == 1L),
      "excludeSelf=false: the request's stored twin must be its dense top-1")
    val panel = SearchOps.hybridSearchBatchFromIndexes(
      spark, pdir, vdir, terms, batch, 10, keepPairs = standing)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(3)))
    assert(panel.filter(r => r._1 == 0L && r._2 == 0L).forall(_._3 == -1L),
      "the corpus-panel default must keep DENSE self-exclusion (rank_dense = -1)")
  }

  test("keepPairsFrom lints a non-equi predicate's nested-loop relation build") {
    import graft.sources.Tables
    val docs = Tables.documents(spark, sf).select($"doc_id".as("vec_id"), $"lang")
    // req_lang must be data-dependent: a literal would constant-fold
    // into a docs-side filter and leave a genuine cross join behind
    val reqDf = queries.limit(2)
      .withColumn("req_lang", when($"query_id" % 2 === 0, "en").otherwise("de"))
      .withColumn("lo", $"query_id" * 10L)

    // equi predicate: keyed join, no lint
    val before = VectorOps.nonEquiKeepPairsBuilds.get()
    VectorOps.keepPairsFrom(reqDf, docs, docs("lang") === reqDf("req_lang"))
    assert(VectorOps.nonEquiKeepPairsBuilds.get() === before,
      "an equi predicate must not trip the nested-loop lint")

    // range predicate: the relation build pays a nested-loop — the docs
    // promise this cost is visible HERE, and now the engine says so
    VectorOps.keepPairsFrom(reqDf, docs, docs("vec_id") >= reqDf("lo"))
    assert(VectorOps.nonEquiKeepPairsBuilds.get() === before + 1,
      "a range predicate's BNLJ relation build must be counted")
  }
}
