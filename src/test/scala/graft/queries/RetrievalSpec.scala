package graft.queries

import graft.SparkSpec

/** Round-13 retrieval pack — BM25, RRF hybrid fusion, PRF query
  * expansion, shingle novelty — each verified against an independent
  * in-JVM brute-force implementation (the catalog oracle gate already
  * hash-checks them against DuckDB; these specs pin the SEMANTICS
  * against a second, hand-rolled scorer and probe planted edge cases
  * the fixture corpus can't express).
  */
class RetrievalSpec extends SparkSpec {

  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"
  private val terms = Seq("spark", "join", "window")

  private lazy val docToks: Array[(Long, Array[String])] =
    graft.sources.Tables.documents(spark, sf)
      .select($"doc_id", $"text")
      .collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" ").filter(_.nonEmpty))

  /** The integer-rational BM25 saturation (k1 = 1.2, b = 0.75) — see
    * SearchOps object docs for the derivation.
    */
  private def sat(tf: Long, dl: Long, tl: Long, n: Long): Long =
    22000000L * tf * tl / (10L * tf * tl + 3L * tl + 9L * dl * n)

  /** Brute-force BM25 over an arbitrary term set: doc -> score_pp12. */
  private def bm25Brute(queryTerms: Seq[String]): Map[Long, Long] = {
    val n = docToks.length.toLong
    val tl = docToks.map(_._2.length.toLong).sum
    val tf = docToks.map { case (id, tk) =>
      (id, tk.length.toLong,
        queryTerms.map(t => t -> tk.count(_ == t).toLong).filter(_._2 > 0).toMap)
    }.filter(_._3.nonEmpty)
    val df = queryTerms.map(t => t -> tf.count(_._3.contains(t)).toLong)
      .filter(_._2 > 0).toMap
    tf.map { case (id, dl, m) =>
      id -> m.map { case (t, f) =>
        (n * 1000000L / df(t)) * sat(f, dl, tl, n)
      }.sum
    }.toMap
  }

  private def topK(scores: Map[Long, Long], k: Int): Seq[(Long, Long)] =
    scores.toSeq.sortBy { case (id, sc) => (-sc, id) }.take(k)

  test("t_bm25_search equals brute-force integer BM25 top-15 with ranks") {
    val expect = topK(bm25Brute(terms), 15)
    val got = Catalog.queries("t_bm25_search")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.map(t => (t._1, t._2)).toSeq === expect)
    assert(got.map(_._3).toSeq === (1 to 15).map(_.toLong))
  }

  test("BM25 saturation closed form: k1/b fidelity, diminishing tf, length penalty") {
    // an average-length doc (dl*n == tl): sat(tf=1) must be exactly 1.0,
    // sat(tf=2) exactly 2*2.2/3.2 = 1.375 — the k1 = 1.2 closed form
    assert(sat(1, 100, 5000, 50) === 1000000L)
    assert(sat(2, 100, 5000, 50) === 1375000L)
    // diminishing returns: increments shrink as tf grows
    val s = (1 to 6).map(tf => sat(tf.toLong, 100, 5000, 50))
    val deltas = s.sliding(2).map(p => p(1) - p(0)).toSeq
    assert(deltas === deltas.sorted.reverse && deltas.forall(_ > 0))
    // asymptote: never exceeds k1+1 = 2.2
    assert(sat(1000000, 100, 5000, 50) <= 2200000L)
    // length normalization: same tf, doc twice the average length scores lower
    assert(sat(2, 200, 5000, 50) < sat(2, 100, 5000, 50))
    assert(sat(2, 50, 5000, 50) > sat(2, 100, 5000, 50))
  }

  /** Dense cosine list against vec 0's embedding — same left-to-right
    * double fold as the dot_d kernel.
    */
  private def denseRanks(pool: Int): Seq[(Long, Long)] = {
    val embs = graft.sources.Tables.embeddings(spark, sf)
      .select($"vec_id", $"embedding")
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray)
      .toMap
    val docIds = docToks.map(_._1).toSet
    def dot(a: Array[Float], b: Array[Float]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { s += a(i).toDouble * b(i).toDouble; i += 1 }
      s
    }
    val q = embs(0L)
    val sims = embs.toSeq
      .filter { case (id, _) => id != 0L && docIds(id) }
      .map { case (id, e) =>
        id -> math.floor(1e6 * (dot(q, e) / (math.sqrt(dot(q, q)) * math.sqrt(dot(e, e))))).toLong
      }
    sims.sortBy { case (id, sm) => (-sm, id) }.take(pool)
      .zipWithIndex.map { case ((id, _), i) => id -> (i + 1).toLong }
  }

  test("t_rrf_fusion equals brute-force reciprocal-rank fusion") {
    val sparse = topK(bm25Brute(terms) - 0L, 20)
      .zipWithIndex.map { case ((id, _), i) => id -> (i + 1).toLong }
    val dense = denseRanks(20)
    val sm = sparse.toMap
    val dm = dense.toMap
    val fused = (sm.keySet ++ dm.keySet).toSeq.map { id =>
      val rrf = sm.get(id).map(r => 1000000L / (60L + r)).getOrElse(0L) +
        dm.get(id).map(r => 1000000L / (60L + r)).getOrElse(0L)
      (id, sm.getOrElse(id, -1L), dm.getOrElse(id, -1L), rrf)
    }.sortBy { case (id, _, _, rrf) => (-rrf, id) }.take(10)
      .zipWithIndex.map { case ((id, rs, rd, rrf), i) => (id, rs, rd, rrf, (i + 1).toLong) }
    val got = Catalog.queries("t_rrf_fusion")(spark, sf)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toSeq
    assert(got === fused)
    // the fusion is genuinely hybrid on this corpus: at least one fused
    // doc must carry a rank from each list
    assert(got.exists(_._2 > 0) && got.exists(_._3 > 0))
  }

  test("t_prf_expand equals the two-round brute force") {
    val n = docToks.length.toLong
    val round1 = topK(bm25Brute(terms), 10).map(_._1).toSet
    // expansion: top-2 non-query terms of the feedback docs by summed tf
    val fbTf = docToks.filter(t => round1(t._1))
      .flatMap(_._2).filterNot(terms.contains)
      .groupBy(identity).view.mapValues(_.length.toLong).toSeq
    val expansion = fbTf.sortBy { case (t, c) => (-c, t) }.take(2).map(_._1)
    val expect = topK(bm25Brute(terms ++ expansion), 15)
    val got = Catalog.queries("t_prf_expand")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got.toSeq === expect)
    assert(expansion.size === 2 && expansion.forall(t => !terms.contains(t)),
      s"fixture must actually exercise expansion: $expansion")
    // n is used by bm25Brute through closure-free recompute; silence unused
    assert(n > 0)
  }

  test("t_shingle_novelty: planted duplicates zero each other; unique docs fully novel") {
    val dir = java.nio.file.Files.createTempDirectory("graft-novelty").toString
    Seq(
      (1L, "a b c d e f", "en", "web", 11L),
      (2L, "a b c d e f", "en", "web", 11L), // exact twin of 1 -> both 0 novel
      (3L, "p q r s t u", "en", "web", 11L), // unique -> fully novel
      (4L, "a b c z z2 z3", "en", "web", 13L), // shares 1 of 4 shingles with 1/2
      (5L, "x y", "en", "web", 3L), // < 3 tokens -> no shingles -> no row
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    val got = Catalog.queries("t_shingle_novelty")(spark, dir)
      .collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_shingles"), r.getAs[Long]("n_novel"), r.getAs[Long]("novelty_ppm"))))
      .toMap
    assert(got.keySet === Set(1L, 2L, 3L, 4L))
    assert(got(1L) === ((4L, 0L, 0L)) && got(2L) === ((4L, 0L, 0L)))
    assert(got(3L) === ((4L, 4L, 1000000L)))
    assert(got(4L) === ((4L, 3L, 750000L)))
  }

  test("t_phrase_search: adjacency is real — scattered or reordered terms don't match") {
    val dir = java.nio.file.Files.createTempDirectory("graft-phrase").toString
    Seq(
      (1L, "spark join here and spark join there", "en", "web", 38L), // tf 2
      (2L, "a spark join b", "en", "web", 14L), // tf 1
      (3L, "spark x join", "en", "web", 12L), // scattered -> no match
      (4L, "join spark", "en", "web", 10L), // reversed -> no match
      (5L, "spark", "en", "web", 5L), // shorter than the phrase
      (6L, "", "en", "web", 0L), // empty text -> no tokens
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    val got = Catalog.queries("t_phrase_search")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got === Seq((1L, 2L, 1L), (2L, 1L, 2L)))
  }

  test("t_phrase_search parity with a brute-force sliding scan on the fixture") {
    val expect = docToks.map { case (id, tk) =>
      id -> tk.sliding(2).count(w => w.length == 2 && w(0) == "spark" && w(1) == "join").toLong
    }.filter(_._2 > 0)
      .sortBy { case (id, tf) => (-tf, id) }.take(15)
      .zipWithIndex.map { case ((id, tf), i) => (id, tf, (i + 1).toLong) }
    val got = Catalog.queries("t_phrase_search")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got === expect)
    assert(got.nonEmpty)
  }

  test("t_shingle_novelty parity with brute force on the fixture") {
    val shingles = docToks.map { case (id, tk) =>
      id -> tk.sliding(3).filter(_.length == 3).map(_.mkString(" ")).toSet
    }.filter(_._2.nonEmpty)
    val df = shingles.flatMap(_._2).groupBy(identity).view.mapValues(_.length.toLong).toMap
    val expect = shingles.map { case (id, sh) =>
      val novel = sh.count(s => df(s) == 1L).toLong
      id -> ((sh.size.toLong, novel, novel * 1000000L / sh.size))
    }.toMap
    val got = Catalog.queries("t_shingle_novelty")(spark, sf)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(got === expect)
    assert(got.nonEmpty)
  }
}
