package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The Misra-Gries guarantees on planted corpora where vocab >> k, so the
  * eviction (decrement-all) and merge (cut) paths actually run — the
  * catalog's t_token_heavy gate only certifies the theorems on the real
  * corpus, whose tiny vocabulary never saturates the sketch.
  */
class MisraGriesSpec extends SparkSpec {

  private def sketchOf(tokens: Seq[String], k: Int, parts: Int): Map[String, Long] = {
    import spark.implicits._
    tokens.toDF("token").repartition(parts).as[String]
      .select(new MisraGriesAggregator(k).toColumn.name("sk"))
      .collect().head.map(e => e.token -> e.est).toMap
  }

  /** Zipf-ish stream: token i (1-based) appears floor(scale/i) times. */
  private def zipf(vocab: Int, scale: Int): Seq[String] =
    (1 to vocab).flatMap(i => Seq.fill(scale / i)(s"tok$i"))

  test("MG bound holds under eviction and multi-partition merges (vocab >> k)") {
    val stream = zipf(vocab = 200, scale = 2000) // N ~= 11,766; head is heavy
    val n = stream.size.toLong
    val exact = stream.groupBy(identity).view.mapValues(_.size.toLong).toMap
    for (parts <- Seq(1, 8); k <- Seq(8, 16)) {
      val sk = sketchOf(stream, k, parts)
      assert(sk.size <= k, s"parts=$parts k=$k: ${sk.size} counters")
      // every provably heavy token survives
      exact.filter { case (_, c) => c * (k + 1) > n }.keys.foreach { t =>
        assert(sk.contains(t), s"parts=$parts k=$k: heavy $t evicted")
      }
      // estimates undercount, by at most N/(k+1)
      sk.foreach { case (t, est) =>
        assert(est <= exact(t), s"parts=$parts k=$k: $t overcounted $est > ${exact(t)}")
        assert((exact(t) - est) * (k + 1) <= n,
          s"parts=$parts k=$k: $t error ${exact(t) - est} > N/(k+1)")
      }
    }
  }

  test("MG is exact when the vocabulary fits the counters") {
    // no reduce-path eviction (size never exceeds k) and no merge cut
    // (partials sum to <= k keys), so every count is exact
    val stream = zipf(vocab = 12, scale = 500)
    val exact = stream.groupBy(identity).view.mapValues(_.size.toLong).toMap
    for (parts <- Seq(1, 8)) {
      val sk = sketchOf(stream, k = 16, parts = parts)
      assert(sk === exact, s"parts=$parts: sketch drifted from exact counts")
    }
  }

  test("t_token_heavy certifies the theorems on the real corpus") {
    val rows = graft.queries.Catalog.queries("t_token_heavy")(spark, "/root/testdata/sf0.001")
      .collect()
    assert(rows.nonEmpty, "no provably-heavy token at sf0.001 — gate is vacuous")
    rows.foreach { r =>
      assert(r.getBoolean(2) && r.getBoolean(3) && r.getBoolean(4),
        s"theorem boolean false for token ${r.getString(0)}")
    }
  }
}
