package graft.queries

import graft.SparkSpec

/** Unit coverage for the TextOps internals the oracle queries can't reach
  * at test scale — the LSH mega-bucket guard needs a degenerate corpus.
  */
class TextOpsSpec extends SparkSpec {

  // 300 documents with IDENTICAL shingle sets: every band bucket holds all
  // 300 docs — the degenerate template corpus the guard exists for
  private def degenerateShingles = {
    import spark.implicits._
    val shingles = Seq("a b c", "b c d", "c d e")
    (1 to 300).flatMap(i => shingles.map(s => (i.toLong, s))).toDF("doc_id", "sh")
  }

  test("streamBandRows equals the batch signature row-for-row") {
    import spark.implicits._
    // varied lengths incl. a doc under 3 tokens (no shingles -> no rows)
    val probe = Seq(
      (1L, (1 to 12).map(i => s"w1_$i").mkString(" ")),
      (2L, (1 to 5).map(i => s"w2_$i").mkString(" ")),
      (3L, "three tokens here"),
      (4L, "too short")).toDF("doc_id", "text")
    val batchRows = TextOps.minhashBandRows(TextOps.shinglesOfDf(probe))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getStruct(2).toString)).toSet
    val streamRows = TextOps.streamBandRows(probe)
      .select($"doc_id", $"band", $"bkey")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getStruct(2).toString)).toSet
    assert(streamRows === batchRows,
      "per-row projection signature must equal the batch groupBy(min) signature")
    assert(!batchRows.exists(_._1 == 4L), "sub-3-token docs sign nothing")
    assert(batchRows.exists(_._1 == 3L), "3-token docs sign exactly one shingle")
  }

  test("mega-bucket guard drops over-cap buckets entirely") {
    val pairs = TextOps.minhashPairs(degenerateShingles, cap = 100)
    assert(pairs.count() === 0)
  }

  test("buckets at or under the cap still pair-expand fully") {
    val pairs = TextOps.minhashPairs(degenerateShingles, cap = 300)
    // all docs collide in every band -> complete pair set, deduped
    assert(pairs.count() === 300L * 299 / 2)
    // doc_a < doc_b by construction
    assert(pairs.filter("doc_a >= doc_b").count() === 0)
  }

  test("t_repetition signals match a brute-force per-doc recount") {
    val sf = "/root/testdata/sf0.01"
    val got = Catalog.queries("t_repetition")(spark, sf).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("dup_tri_pct"), r.getAs[Long]("top_bigram_pct"),
          r.getAs[Boolean]("repetitive"))).toMap
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .collect().map(r => r.getLong(0) -> r.getString(1))
    assert(got.size === docs.length)
    docs.foreach { case (id, text) =>
      val tk = text.split(" ").filter(_.nonEmpty)
      val tris = tk.sliding(3).filter(_.length == 3).map(_.mkString(" ")).toSeq
      val dupPct =
        if (tris.isEmpty) 0L
        else math.floor(100.0 * (tris.size - tris.distinct.size) / tris.size).toLong
      val bgs = tk.sliding(2).filter(_.length == 2).map(_.mkString(" ")).toSeq
      val topPct =
        if (bgs.isEmpty) 0L
        else math.floor(100.0 * bgs.groupBy(identity).values.map(_.size).max / bgs.size).toLong
      assert(got(id) === ((dupPct, topPct, dupPct >= 5 || topPct >= 10)), s"doc $id")
    }
    // the signal must discriminate on this corpus: flags a minority, not none
    val flagged = got.values.count(_._3)
    assert(flagged > 0 && flagged < got.size / 4, s"flagged $flagged of ${got.size}")
  }

  test("t_length_quantiles equals sorted brute-force type-1 quantiles per lang") {
    val sf = "/root/testdata/sf0.01"
    val got = Catalog.queries("t_length_quantiles")(spark, sf).collect()
      .map(r => r.getAs[String]("lang") ->
        (r.getAs[Long]("n_docs"), r.getAs[Long]("p50"), r.getAs[Long]("p90"),
          r.getAs[Long]("p99"))).toMap
    val byLang = spark.read.parquet(s"$sf/documents.parquet")
      .collect()
      .map(r => r.getString(2) -> r.getString(1).split(" ").count(_.nonEmpty).toLong)
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted.toIndexedSeq).toMap
    assert(got.keySet === byLang.keySet)
    byLang.foreach { case (lang, vals) =>
      val n = vals.length
      def q(pct: Int): Long = vals(((n.toLong * pct + 99) / 100).toInt - 1)
      assert(got(lang) === ((n.toLong, q(50), q(90), q(99))), s"lang $lang")
      // quantiles are monotone and within the observed range
      assert(got(lang)._2 <= got(lang)._3 && got(lang)._3 <= got(lang)._4)
    }
  }

  test("t_quantiles_approx: exact columns equal t_length_quantiles, theorem booleans hold") {
    val sf = "/root/testdata/sf0.01"
    val approx = Catalog.queries("t_quantiles_approx")(spark, sf).collect()
      .map(r => r.getAs[String]("lang") ->
        ((r.getAs[Long]("n_docs"), r.getAs[Long]("p50"), r.getAs[Long]("p90"),
          r.getAs[Long]("p99")),
          (r.getAs[Boolean]("a50_ok"), r.getAs[Boolean]("a90_ok"),
            r.getAs[Boolean]("a99_ok")))).toMap
    val exact = Catalog.queries("t_length_quantiles")(spark, sf).collect()
      .map(r => r.getAs[String]("lang") ->
        (r.getAs[Long]("n_docs"), r.getAs[Long]("p50"), r.getAs[Long]("p90"),
          r.getAs[Long]("p99"))).toMap
    assert(approx.keySet === exact.keySet)
    approx.foreach { case (lang, (ex, bands)) =>
      assert(ex === exact(lang), s"$lang exact columns drifted from t_length_quantiles")
      assert(bands === ((true, true, true)), s"$lang GK rank band violated")
    }
  }

  test("t_dedup_stats histogram reconciles with the resolver's clusters") {
    val sf = "/root/testdata/sf0.01"
    val hist = Catalog.queries("t_dedup_stats")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val clusters = Catalog.queries("t_neardup_clusters")(spark, sf).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("rep")))
    val nDocs = spark.read.parquet(s"$sf/documents.parquet").count()
    // rows sum to the corpus; n_docs = size * count per row
    assert(hist.map(_._3).sum === nDocs)
    hist.foreach { case (size, n, docs) => assert(docs === size * n) }
    // the non-singleton part of the histogram equals a recount of the
    // resolver's own components (the resolver output covers only docs in
    // at least one pair; singletons are the remainder)
    val sizes = clusters.groupBy(_._2).map(_._2.size.toLong)
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    hist.filter(_._1 > 1L).foreach { case (size, n, _) =>
      assert(sizes(size) === n, s"size-$size cluster count drifted")
    }
    assert(hist.exists(_._1 > 1L), "fixture has near-dup clusters; histogram must show them")
  }

  test("keep-best keeper diverges from keep-min when the lowest id is the worst copy") {
    import spark.implicits._
    // 25 distinct words -> 'good' quality; doc 1 is the SAME text padded
    // with stopword spam (stop_pct blows the 'good' gate -> 'fair'), docs
    // 2 and 3 are identical clean copies, doc 9 is unrelated. LSH links
    // {1,2,3} (shared base shingles dominate the minima), so keep-min
    // would keep doc 1 — the keep-best policy must keep doc 2 instead
    // (first 'good' by (quality, n_tokens DESC, doc_id)).
    val base = (1 to 25).map(i => s"w$i").mkString(" ")
    val spam = Seq.fill(18)("the").mkString(" ")
    val docsDf = Seq(
      (1L, s"$base $spam"),
      (2L, base),
      (3L, base),
      (9L, (1 to 25).map(i => s"z$i").mkString(" ")),
    ).toDF("doc_id", "text")
    val got = TextOps.keepBestOn(docsDf).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("rep"), r.getAs[String]("quality"), r.getAs[Boolean]("is_kept"))))
      .toMap
    assert(got(1L)._1 === 1L && got(2L)._1 === 1L && got(3L)._1 === 1L,
      s"docs 1-3 must form one cluster labeled by min id 1: $got")
    assert(got(1L)._2 === "fair" && got(2L)._2 === "good")
    assert(!got(1L)._3, "keep-min would keep doc 1; keep-best must not")
    assert(got(2L)._3 && !got(3L)._3, "doc 2 is the first 'good' copy")
    assert(got(9L)._1 === 9L && got(9L)._3, "singletons are their own kept cluster")
  }
}
