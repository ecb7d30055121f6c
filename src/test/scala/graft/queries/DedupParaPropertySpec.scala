package graft.queries

import graft.SparkSpec

/** Differential property test for paragraph-level dedup: seeded random
  * corpora with PLANTED cross-document boilerplate blocks driven through
  * the real Spark operator ([[TextOps.dedupParaOn]]) and compared against
  * an independent brute-force reimplementation of the contract — global
  * first occurrence per distinct paragraph in (doc_id, position) order,
  * in-order reassembly. The planted blocks make the interesting paths
  * (cross-doc removal, within-doc repeats, all-duplicate documents)
  * certain to occur, which fixture-corpus testing can't guarantee.
  */
class DedupParaPropertySpec extends SparkSpec {

  private val P = 25 // block size — must match TextOps.paraTokens

  /** Brute-force oracle: (doc_id, n_paras, n_kept, clean_text). */
  private def brute(docs: Seq[(Long, String)]): Map[Long, (Long, Long, String)] = {
    val paras = docs.sortBy(_._1).flatMap { case (id, text) =>
      val tk = text.split(" ").filter(_.nonEmpty)
      if (tk.isEmpty) Nil
      else tk.grouped(P).zipWithIndex.map { case (blk, i) => (id, i, blk.mkString(" ")) }
    }
    val firstOwner = scala.collection.mutable.Map[String, (Long, Int)]()
    paras.sortBy(p => (p._1, p._2)).foreach { case (id, i, para) =>
      if (!firstOwner.contains(para)) firstOwner(para) = (id, i)
    }
    paras.groupBy(_._1).map { case (id, ps) =>
      val kept = ps.sortBy(_._2).filter { case (d, i, para) => firstOwner(para) == ((d, i)) }
      id -> (ps.size.toLong, kept.size.toLong, kept.map(_._3).mkString(" "))
    }
  }

  private def run(docs: Seq[(Long, String)]): Map[Long, (Long, Long, String)] = {
    import spark.implicits._
    val df = spark.createDataset(docs.toIndexedSeq).toDF("doc_id", "text")
    TextOps.dedupParaOn(df).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_paras"), r.getAs[Long]("n_kept"), r.getAs[String]("clean_text")))
      .toMap
  }

  test("random corpora with planted boilerplate: operator equals brute force") {
    val vocab = Array("a", "b", "c", "d", "e", "f", "g", "h")
    for (seed <- 1 to 5) {
      val rnd = new scala.util.Random(seed)
      // a handful of shared boilerplate blocks (exactly P tokens each)
      val boiler = Seq.tabulate(3)(_ =>
        Array.fill(P)(vocab(rnd.nextInt(vocab.length))).mkString(" "))
      val docs: Seq[(Long, String)] = (0L until 40L).map { id =>
        val nBlocks = 1 + rnd.nextInt(4)
        val blocks = (0 until nBlocks).map { _ =>
          if (rnd.nextInt(3) == 0) boiler(rnd.nextInt(boiler.length))
          else Array.fill(P)(vocab(rnd.nextInt(vocab.length))).mkString(" ")
        }
        // occasional ragged tail block (< P tokens) to exercise the slice
        val tail =
          if (rnd.nextBoolean())
            Seq(Array.fill(1 + rnd.nextInt(P - 1))(vocab(rnd.nextInt(vocab.length))).mkString(" "))
          else Nil
        (id, (blocks ++ tail).mkString(" "))
      }
      val got = run(docs)
      val want = brute(docs)
      assert(got === want, s"seed $seed")
      // global invariant: every distinct paragraph survives exactly once
      val keptParas = got.toSeq.flatMap { case (_, (_, _, clean)) =>
        clean.split(" ").filter(_.nonEmpty).grouped(P).map(_.mkString(" ")).toSeq
      }
      assert(keptParas.size === keptParas.distinct.size,
        s"seed $seed: a paragraph survived twice")
      // and some cross-document removal actually happened (planted blocks)
      assert(got.values.exists { case (np, nk, _) => nk < np }, s"seed $seed: nothing removed")
    }
  }

  test("degenerate corpora: all-identical docs collapse to one copy; empty docs vanish") {
    val text = (1 to 2 * P).map(i => s"w${i % 7}").mkString(" ") // 2 full blocks
    val docs = (0L until 10L).map(id => (id, text)) :+ (99L, "")
    val got = run(docs)
    assert(!got.contains(99L), "token-less docs produce no row (matches the oracle's unnest)")
    assert(got(0L) === ((2L, 2L, text)), "first doc keeps everything")
    (1L until 10L).foreach(id => assert(got(id) === ((2L, 0L, "")), s"doc $id must empty out"))
  }
}
