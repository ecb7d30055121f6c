package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The MMR greedy recursion (`VectorOps.mmrSelect`) against a
  * hand-rolled reference greedy on planted pools — including the case
  * the operator exists for: a redundant runner-up that plain top-k
  * would keep and diversification must skip.
  */
class MmrSpec extends SparkSpec {

  import spark.implicits._

  /** Reference greedy: identical integer contract (85·simq − 15·max_sel,
    * ties on cand_id asc), sequential by construction.
    */
  private def referenceMmr(
      pool: Seq[(Long, Long, Long)], // (query_id, cand_id, simq)
      pairs: Map[(Long, Long, Long), Long], // (query_id, a, b) -> ab
      k: Int): Seq[(Long, Long, Long, Long)] = {
    pool.groupBy(_._1).toSeq.flatMap { case (q, cands) =>
      var remaining = cands.map(c => c._2 -> c._3).toMap
      var picked = Vector.empty[(Long, Long, Long, Long)]
      var sel = Vector.empty[Long]
      for (i <- 1 to k if remaining.nonEmpty) {
        val scored = remaining.toSeq.map { case (c, simq) =>
          val pen = if (sel.isEmpty) 0L else sel.map(s => pairs((q, c, s))).max
          (c, 85L * simq - 15L * pen)
        }
        val (c, mmr) = scored.minBy { case (c, m) => (-m, c) }
        picked :+= ((q, c, i.toLong, mmr))
        sel :+= c
        remaining -= c
      }
      picked
    }
  }

  private def run(
      pool: Seq[(Long, Long, Long)],
      pairs: Map[(Long, Long, Long), Long]): Set[(Long, Long, Long, Long)] = {
    val poolDf = pool.toDF("query_id", "cand_id", "simq")
    val pairDf = pairs.toSeq.map { case ((q, a, b), ab) => (q, a, b, ab) }
      .toDF("query_id", "a", "b", "ab")
    VectorOps.mmrSelect(poolDf, pairDf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
  }

  test("diversification skips a redundant runner-up plain top-k keeps") {
    // q=1: cand 10 best; cand 11 is a near-duplicate of 10 (pair sim
    // .99); cand 12 is unrelated (pair sim .10). pick-2 goes diverse
    // iff 85·(sim11 − sim12) < 15·(ab(11,10) − ab(12,10)) — false for
    // this wide sim gap (plain relevance wins), true for the tight one
    // below (diversification wins); the reference greedy pins both.
    val pool = Seq((1L, 10L, 900000L), (1L, 11L, 890000L), (1L, 12L, 500000L))
    def sym(m: Map[(Long, Long, Long), Long]) =
      m ++ m.map { case ((q, a, b), v) => (q, b, a) -> v }
    val pairs = sym(Map(
      (1L, 10L, 11L) -> 990000L,
      (1L, 10L, 12L) -> 100000L,
      (1L, 11L, 12L) -> 120000L))
    val got = run(pool, pairs)
    val want = referenceMmr(pool, pairs, 5).toSet
    assert(got === want)
    // the planted intent actually fires: pick-2 is the diverse candidate
    // iff 85·(sim11 − sim12) < 15·(ab(11,10) − ab(12,10));
    // 85·390000 = 33_150_000 vs 15·890000 = 13_350_000 → pick-2 is 11
    // here, so tighten the sims until diversification wins:
    val pool2 = Seq((1L, 10L, 900000L), (1L, 11L, 895000L), (1L, 12L, 880000L))
    val got2 = run(pool2, pairs)
    val want2 = referenceMmr(pool2, pairs, 5).toSet
    assert(got2 === want2)
    val pick2 = got2.find(t => t._3 == 2L).get._2
    assert(pick2 === 12L,
      "MMR must skip the near-duplicate runner-up for the diverse candidate")
  }

  test("property: random pools equal the reference greedy (multi-query, short pools)") {
    val rnd = new scala.util.Random(151515)
    // 3 queries; pool sizes 2/5/9 (one SHORTER than mmrPick — picks
    // must just stop); sims in [-1e6, 1e6]
    val sizes = Map(1L -> 2, 2L -> 5, 3L -> 9)
    val pool = sizes.toSeq.flatMap { case (q, n) =>
      (0 until n).map(i => (q, 100L * q + i, rnd.nextLong(2000001L) - 1000000L))
    }
    val pairs = (for {
      (q, n) <- sizes.toSeq
      a <- 0 until n; b <- 0 until n if a != b
    } yield (q, 100L * q + a, 100L * q + b)).map { key =>
      key -> (rnd.nextLong(2000001L) - 1000000L)
    }.toMap
    // symmetrize (cosine is): keep max of the two directions
    val symPairs = pairs.map { case ((q, a, b), v) =>
      val twin = pairs((q, b, a))
      (q, a, b) -> math.max(v, twin)
    }
    val got = run(pool, symPairs)
    val want = referenceMmr(pool, symPairs, 5).toSet
    assert(got === want)
    // the short pool stopped at its size
    assert(got.count(_._1 == 1L) === 2)
  }
}
