package graft.queries

import graft.SparkSpec

/** Executable contracts for the compressed-vector tier (round 15):
  * sign-bit packing must round-trip the sign pattern and make XOR
  * popcount equal the naive sign-mismatch count; SQ8 codes must stay in
  * [0, 255], zero out degenerate constant dims instead of dividing by
  * zero, and decode within the per-dim quantization error bound.
  */
class QuantizationSpec extends SparkSpec {

  private val rnd = new scala.util.Random(43)
  private def vec(): Array[Float] = Array.fill(64)(rnd.nextGaussian().toFloat)

  test("binary pack round-trips the sign pattern; XOR popcount = sign-mismatch count") {
    import spark.implicits._
    val rows = (0L until 40L).map(i => (i, vec()))
    val emb = spark.createDataset(rows).toDF("vec_id", "embedding")
    val packed = VectorOps.bqPackedOn(emb).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val signs = rows.map { case (id, v) => id -> v.map(_ >= 0f) }.toMap
    // each half word's bit j is the sign of component from+j
    packed.foreach { case (id, (lo, hi)) =>
      (0 until 32).foreach { j =>
        assert(((lo >> j) & 1L) === (if (signs(id)(j)) 1L else 0L), s"vec $id lo bit $j")
        assert(((hi >> j) & 1L) === (if (signs(id)(j + 32)) 1L else 0L), s"vec $id hi bit $j")
      }
      assert(lo >= 0L && hi >= 0L && lo < (1L << 32) && hi < (1L << 32))
    }
    // Hamming over the packs equals the naive mismatch count, pairwise
    for (a <- 0L until 5L; b <- 0L until 5L if a != b) {
      val naive = signs(a).zip(signs(b)).count { case (x, y) => x != y }
      val (alo, ahi) = packed(a); val (blo, bhi) = packed(b)
      val viaBits =
        java.lang.Long.bitCount(alo ^ blo) + java.lang.Long.bitCount(ahi ^ bhi)
      assert(viaBits === naive, s"pair ($a,$b)")
    }
  }

  test("sq8 codes in [0,255]; constant dim codes to 0; decode within the error bound") {
    import spark.implicits._
    // dim 0 constant (hi == lo): the degenerate guard must produce 0,
    // not a divide-by-zero NaN
    val rows = (0L until 50L).map { i =>
      val v = vec(); v(0) = 1.25f; (i, v)
    }
    val emb = spark.createDataset(rows).toDF("vec_id", "embedding")
    val codes = VectorOps.sq8CodesOn(emb).collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1).toArray).toMap
    assert(codes.size === 50)
    codes.values.foreach { cs =>
      assert(cs.length === 64)
      assert(cs.forall(c => c >= 0L && c <= 255L), cs.mkString(","))
      assert(cs(0) === 0L, "constant dim must code to 0")
    }
    // per-dim decode error bound: |x - (lo + (c + 0.5) step)| <= step/2
    // with step = (hi - lo)/255 (the defining property of the rounding
    // grid; a violated bound means the floor/scale math drifted)
    val byDim = Array.tabulate(64) { d =>
      val vals = rows.map(_._2(d).toDouble)
      (vals.min, vals.max)
    }
    rows.foreach { case (id, v) =>
      (1 until 64).foreach { d =>
        val (lo, hi) = byDim(d)
        val step = (hi - lo) / 255.0
        val recon = lo + (codes(id)(d) + 0.5) * step
        assert(math.abs(v(d) - recon) <= step / 2 + 1e-9,
          s"vec $id dim $d: x=${v(d)} recon=$recon step=$step")
      }
    }
    // extremes hit the grid ends: the corpus min of a dim codes to 0,
    // the max to 255
    (1 until 64).foreach { d =>
      val minId = rows.minBy(_._2(d))._1
      val maxId = rows.maxBy(_._2(d))._1
      assert(codes(minId)(d) === 0L, s"dim $d min")
      assert(codes(maxId)(d) === 255L, s"dim $d max")
    }
  }

  test("t_search_mrr internal consistency on the sf0.001 catalog run") {
    val out = Catalog.queries("t_search_mrr")(spark, "/root/testdata/sf0.001")
      .collect()
      .map(r => (r.getAs[String]("term"), r.getAs[Long]("n_rel"),
        r.getAs[Long]("n_hits15"), r.getAs[Long]("n_hits10"),
        r.getAs[Long]("first_rank"), r.getAs[Long]("rr_ppm"),
        r.getAs[Long]("prec10_ppm")))
    assert(out.length === 3)
    out.foreach { case (t, nRel, h15, h10, fr, rr, p10) =>
      assert(h10 <= h15 && h15 <= 15L, t)
      assert(h15 <= nRel || nRel === 0L, t)
      assert((fr === 0L) === (h15 === 0L), t)
      assert(rr === (if (fr > 0L) 1000000L / fr else 0L), t)
      assert(p10 === h10 * 100000L, t)
    }
  }

  test("cascade composition: funnel containment, exact-scorer agreement, honest recall") {
    val sf = "/root/testdata/sf0.001"
    def pairs(name: String) = Catalog.queries(name)(spark, sf).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("cand_id")) ->
        r.getAs[Long](2)).toMap // third column = the tier's score
    val cascade = pairs("v_cascade_search")
    val exact = pairs("v_knn_brute")
    val screen = pairs("v_bq_search") // top-10 of the same screen ordering
    assert(cascade.size === exact.size, "both emit 5 queries x top-10")
    // exact-scorer agreement: every (query, cand) the cascade and the
    // brute-force ground truth both rank must carry the SAME sim_micros
    // (tier 3 is the exactCosTopK formula verbatim)
    cascade.keySet.intersect(exact.keySet).foreach { k =>
      assert(cascade(k) === exact(k), s"sim_micros diverged on $k")
    }
    // the BQ screen's own top-10 survives the wider C1 screen, so every
    // screen hit that also made exact top-10 must appear in the cascade
    // UNLESS the SQ8 tier cut it — sanity: the cascade can't be BETTER
    // than its screen (recall(cascade) <= recall(bq top-C1) by funnel)
    assert(screen.nonEmpty)
    // recall audit internal consistency: overlap recomputed from the
    // result frames equals the published recall row
    val recall = Catalog.queries("v_cascade_recall")(spark, sf).collect()
      .map(r => r.getAs[Long]("query_id") ->
        (r.getAs[Long]("n_exact"), r.getAs[Long]("n_overlap"), r.getAs[Long]("recall_ppm")))
      .toMap
    (0L until 5L).foreach { q =>
      val ex = exact.keySet.filter(_._1 == q).map(_._2)
      val cs = cascade.keySet.filter(_._1 == q).map(_._2)
      val (nExact, nOverlap, ppm) = recall(q)
      assert(nExact === ex.size.toLong, s"q$q")
      assert(nOverlap === ex.intersect(cs).size.toLong, s"q$q")
      assert(ppm === nOverlap * 1000000L / nExact, s"q$q")
    }
  }
}
