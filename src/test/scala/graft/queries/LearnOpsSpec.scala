package graft.queries

import graft.SparkSpec

/** LearnOps — sufficient-statistics parity with an in-JVM recount, and
  * the full train-then-score loop: solve the normal equations from the
  * catalog query's output and verify the scorer beats the majority
  * baseline by a wide margin.
  */
class LearnOpsSpec extends SparkSpec {

  import spark.implicits._

  private val sf = "/root/testdata/sf0.01"

  private def statsOf(d: String): Seq[(String, String, Long)] =
    Catalog.queries("t_linreg_stats")(spark, d)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSeq

  private def rawFeatures(d: String): Array[(Array[Long], Long)] =
    graft.sources.Tables.documents(spark, d)
      .select($"doc_id", $"text")
      .collect()
      .map { r =>
        val tks = r.getString(1).split(" ").filter(_.nonEmpty)
        val x = LearnOps.tfTerms.map(t => tks.count(_ == t).toLong).toArray ++
          Array(tks.length.toLong, 1L)
        (x, if (tks.length >= 40) 1L else -1L)
      }

  test("t_linreg_stats equals brute-force X'X upper triangle and X'y") {
    val data = rawFeatures(sf)
    val names = LearnOps.featNames
    val expect = scala.collection.mutable.Map.empty[(String, String), Long]
    data.foreach { case (x, y) =>
      for (i <- names.indices; j <- names.indices) {
        val (fa, fb) = (names(i), names(j))
        if (fa <= fb)
          expect((fa, fb)) = expect.getOrElse((fa, fb), 0L) + x(i) * x(j)
      }
      for (i <- names.indices)
        expect((names(i), "__y__")) = expect.getOrElse((names(i), "__y__"), 0L) + x(i) * y
    }
    val got = statsOf(sf).map { case (a, b, s) => (a, b) -> s }.toMap
    assert(got === expect.toMap)
  }

  test("solve + score: train accuracy beats the majority baseline") {
    val stats = statsOf(sf)
    val w = LearnOps.solveNormal(stats)
    assert(w.keySet === LearnOps.featNames.toSet)
    val scored = LearnOps.scoreWith(spark, sf, w)
      .collect().map(r => (r.getLong(1), r.getLong(2)))
    val n = scored.length
    val acc = scored.count { case (sPpm, y) =>
      (if (sPpm >= 0) 1L else -1L) == y
    }.toDouble / n
    val majority = math.max(
      scored.count(_._2 == 1L), scored.count(_._2 == -1L)).toDouble / n
    assert(acc > majority + 0.15, s"acc=$acc majority=$majority")
    assert(acc > 0.9, s"acc=$acc")
  }

  test("training is deterministic: weights from a re-run are identical") {
    val w1 = LearnOps.solveNormal(statsOf(sf))
    val w2 = LearnOps.solveNormal(statsOf(sf))
    assert(w1 === w2)
  }
}
