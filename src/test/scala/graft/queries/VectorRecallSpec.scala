package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Quantifies the ANN quality dial: recall@10 of the sign-LSH and IVF
  * variants against the exact brute-force ranking, plus a planted-twin
  * probe showing the bucketing mechanism retrieves true near-duplicates.
  *
  * The synthetic corpus is near-orthogonal random vectors (pairwise
  * cosine ~ N(0, 1/64)), which is the ADVERSARIAL case for any
  * bucket-restricted ANN — a random vector's nearest neighbors share no
  * structure with it, so sign agreement across 8 hyperplanes is rare.
  * The measured recalls below are therefore data-specific lower bounds;
  * the planted-twin test shows the high-similarity regime the index is
  * for (near-dup mining), where recall is 1.0. Numbers are recorded in
  * SCALING.md ("ANN recall measured").
  */
class VectorRecallSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"
  private val k = 10

  private lazy val emb: Map[Long, Array[Float]] =
    graft.sources.Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding"))
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray)
      .toMap

  /** Exact top-k by (floor(1e6*cosine) desc, cand_id asc) — the same
    * integer ranking key the catalog queries use, so ties break
    * identically.
    */
  private def bruteTopK(queryIds: Seq[Long]): Map[Long, Set[Long]] =
    queryIds.map { q =>
      val qv = emb(q)
      val qn = math.sqrt(qv.map(x => x.toDouble * x).sum)
      val top = emb.iterator
        .filter(_._1 != q)
        .map { case (id, v) =>
          var dot = 0.0
          var i = 0
          while (i < v.length) { dot += qv(i).toDouble * v(i); i += 1 }
          val cn = math.sqrt(v.map(x => x.toDouble * x).sum)
          (id, math.floor(1e6 * (dot / (qn * cn))).toLong)
        }
        .toSeq
        .sortBy { case (id, sim) => (-sim, id) }
        .take(k)
        .map(_._1)
      q -> top.toSet
    }.toMap

  private def annTopK(name: String): Map[Long, Set[Long]] =
    Catalog.queries(name)(spark, sf)
      .filter(col("rnk") <= k)
      .select(col("query_id"), col("cand_id"))
      .collect()
      .groupBy(_.getLong(0))
      .map { case (q, rows) => q -> rows.map(_.getLong(1)).toSet }

  private def recallAt10(got: Map[Long, Set[Long]], want: Map[Long, Set[Long]]): Double = {
    val per = want.map { case (q, truth) =>
      got.getOrElse(q, Set.empty).intersect(truth).size.toDouble / truth.size
    }
    per.sum / per.size
  }

  test("recall@10 of v_ann_lsh, v_ann_lsh_multi and v_ivf_nprobe against exact brute force") {
    // v_ann_lsh queries are vec_id < 5; IVF probes use vec_id in [16, 21)
    val truth = bruteTopK(0L until 5L)
    val lshRecall = recallAt10(annTopK("v_ann_lsh"), truth)
    val lshMultiRecall = recallAt10(annTopK("v_ann_lsh_multi"), truth)
    val ivfRecall = recallAt10(annTopK("v_ivf_nprobe"), bruteTopK(16L until 21L))
    val ivf1Recall = recallAt10(annTopK("v_ivf_search"), bruteTopK(16L until 21L))
    info(f"recall@10 sign-LSH(8 bits)=$lshRecall%.2f  multi-table(L=8)=$lshMultiRecall%.2f  IVF(nprobe=2)=$ivfRecall%.2f  IVF(nprobe=1)=$ivf1Recall%.2f")
    // floors measured on this corpus (lsh=0.02,
    // multi=0.54 per SCALING.md ("ANN recall: multiprobe"),
    // ivf2=0.36, ivf1=0.30 — see scaladoc: random vectors are the
    // adversarial case; these pin the dial's current position, they are
    // not quality targets. The planted-twin test below is the
    // high-similarity quality gate.)
    assert(lshRecall <= 1.0 && ivfRecall <= 1.0)
    assert(ivfRecall >= ivf1Recall, "probing a second cell must not lose candidates")
    assert(ivfRecall >= 0.2, "nprobe=2 should recover a fifth of true neighbors even on random data")
    // OR-amplification: table 0 of the multi-table index IS the single
    // table, so the candidate set is a superset — recall cannot drop...
    assert(lshMultiRecall >= lshRecall, "L-table union must not lose table-0 candidates")
    // ...and per-table collision probability p compounds to 1-(1-p)^L,
    // with Hamming-1 multiprobe lifting per-table p from q^8 to
    // q^7(q + 8(1-q)). Measured on this corpus: union alone 0.10
    // (= 1-(1-0.02)^8 at the granularity of 50 query-neighbor pairs),
    // union + multiprobe 0.54 — pinned with slack.
    assert(lshMultiRecall >= 0.4, "L=8 tables + Hamming-1 multiprobe measured 0.54 here")
  }

  test("v_ivf_recall rows equal a recount from v_ivf_nprobe and exact brute force") {
    // the catalog audit row must be exactly |ivf top-k ∩ brute top-k| per
    // query — recounted here from the published nprobe results and this
    // suite's own independent exact ranking
    val truth = bruteTopK(16L until 21L)
    val ivf = annTopK("v_ivf_nprobe")
    val audit = Catalog.queries("v_ivf_recall")(spark, sf)
      .collect()
      .map(r => r.getAs[Long]("query_id") ->
        ((r.getAs[Long]("n_returned"), r.getAs[Long]("n_hit"), r.getAs[Long]("recall_pct"))))
      .toMap
    assert(audit.keySet === (16L until 21L).toSet, "one audit row per panel query")
    (16L until 21L).foreach { q =>
      val hits = ivf(q).intersect(truth(q)).size.toLong
      assert(audit(q) === ((k.toLong, hits, math.floor(100.0 * hits / k).toLong)),
        s"query $q: audit row must match the set-intersection recount")
    }
  }

  test("trained centroids do not lose recall vs the untrained floor") {
    // the judge metric for v_ivf_recall_trained / v_pq_recall_trained:
    // 2 Lloyd steps must not make the same search budget WORSE — the
    // uplift is in SCALING.md ("trained-centroid IVF recall") and
    // SCALING.md ("trained-codebook PQ recall"): IVF 18->23 / 12->15 /
    // 17->18 and PQ 3->3 / 5->7 / 2->3 hits of 50 at sf0.001/0.01/0.1
    def hits(name: String): Long = Catalog.queries(name)(spark, sf)
      .collect().map(_.getAs[Long]("n_hit")).sum
    Seq("v_ivf_recall" -> "v_ivf_recall_trained",
        "v_pq_recall" -> "v_pq_recall_trained").foreach { case (un, tr) =>
      val untrained = hits(un)
      val trained = hits(tr)
      info(s"$tr panel hits of 50: untrained=$untrained trained=$trained")
      assert(trained >= untrained,
        s"$tr: training regressed recall: $trained < $untrained")
      // and the audit must cover the whole panel with full result lists
      val rows = Catalog.queries(tr)(spark, sf).collect()
      assert(rows.map(_.getAs[Long]("query_id")).toSet === (16L until 21L).toSet)
      assert(rows.forall(_.getAs[Long]("n_returned") === k.toLong))
    }
  }

  test("planted twins: scaled copies share the sign bucket and rank first") {
    import spark.implicits._
    // a scaled copy keeps every component's sign, hence the exact bucket,
    // and has cosine 1.0 with its original — the near-dup regime the
    // bucketed index exists for. Recall@1 over the planted set must be 1.
    val tmp = java.nio.file.Files.createTempDirectory("planted").toString
    val twins = (0L until 5L).map { i =>
      (10000L + i, emb(i).map(_ * 1.05f).toSeq, 99)
    }
    val base = graft.sources.Tables.embeddings(spark, sf)
    twins.toDF("vec_id", "embedding", "label")
      .select(col("vec_id"), col("embedding").cast(base.schema("embedding").dataType), col("label"))
      .unionByName(base)
      .write.parquet(s"$tmp/embeddings.parquet")

    // a scaled copy agrees on EVERY component's sign, so it collides in
    // all L tables of the multi-table index too — both variants must
    // retrieve it at rank 1
    Seq("v_ann_lsh", "v_ann_lsh_multi").foreach { name =>
      val rank1 = Catalog.queries(name)(spark, tmp)
        .filter(col("rnk") === 1)
        .select(col("query_id"), col("cand_id"))
        .collect()
        .map(r => r.getLong(0) -> r.getLong(1))
        .toMap
      (0L until 5L).foreach { i =>
        assert(rank1.get(i) === Some(10000L + i), s"$name: query $i should retrieve its planted twin first")
      }
    }
  }
}
