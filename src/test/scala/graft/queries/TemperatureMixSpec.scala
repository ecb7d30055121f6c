package graft.queries

import graft.SparkSpec

/** Planted closed-form oracle for t_temperature_mix: with sources of
  * 400/100/25 tokens, alpha = 1/2 weights are exactly 20/10/5
  * (perfect squares — no floor slack), the binding source is the
  * smallest one, and the rates follow the closed form
  * rate_s = 1e6 * (w_s * B / W) / T_s — flattening the mixture
  * (smallest source sampled at the highest rate).
  */
class TemperatureMixSpec extends SparkSpec {

  private def docsOf(src: String, n: Int, tokensEach: Int, base: Long) = {
    val text = Seq.fill(tokensEach)("w").mkString(" ")
    (0 until n).map(i => (base + i, src, text))
  }

  test("planted 400/100/25 corpus: exact sqrt weights, binding budget, flattened rates") {
    import spark.implicits._
    // T: big=400 (4x100), mid=100 (4x25), small=25 (1x25)
    val df = (docsOf("big", 4, 100, 0L) ++ docsOf("mid", 4, 25, 100L) ++
      docsOf("small", 1, 25, 200L)).toDF("doc_id", "source", "text")
    val out = CurationOps.temperatureMixOn(df).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("source"),
        r.getAs[Long]("rate_ppm")))
    // closed form: w = (20, 10, 5), W = 35; B = min(T*W/w) = 25*35/5 = 175
    // targets w*B/W = (100, 50, 25); rates 1e6*target/T:
    val rates = out.groupBy(_._2).map { case (s, rs) => s -> rs.head._3 }
    assert(rates.get("big").forall(_ === 250000L))
    assert(rates.get("mid").forall(_ === 500000L))
    assert(rates.get("small").forall(_ === 1000000L))
    // flattening: every admitted small-source doc admitted at rate 1e6
    // means the binding source is kept whole
    val small = out.filter(_._2 == "small")
    assert(small.length === 1 && small.head._3 === 1000000L)
    // the admission gate is the documented salted hash, row by row
    def h60(s: String): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.substring(0, 15), 16)
    }
    val admitted = out.map(_._1).toSet
    val expected = (df.collect().map(r => (r.getLong(0), r.getString(1))))
      .filter { case (id, src) =>
        val rate = Map("big" -> 250000L, "mid" -> 500000L, "small" -> 1000000L)(src)
        h60(s"$id:mix") % 1000000L < rate
      }.map(_._1).toSet
    assert(admitted === expected)
  }

  test("sf0.001 catalog run: rates anti-correlate with source size at the extremes") {
    val out = Catalog.queries("t_temperature_mix")(spark, "/root/testdata/sf0.001")
      .collect().map(r => (r.getAs[String]("source"), r.getAs[Long]("rate_ppm")))
    assert(out.nonEmpty)
    val bySrc = out.groupBy(_._1).map { case (s, rs) => s -> rs.head._2 }
    // recompute token totals independently of the operator
    val toks = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .selectExpr("source", "size(filter(split(text, ' '), x -> x != '')) AS n")
      .groupBy("source").sum("n")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val maxSrc = toks.maxBy(_._2)._1
    val minSrc = toks.minBy(_._2)._1
    assert(bySrc(minSrc) >= bySrc(maxSrc),
      s"flattening must not sample the biggest source above the smallest: $bySrc")
    // every rate positive (all sources participate) and <= 1e6
    bySrc.values.foreach(r => assert(r > 0L && r <= 1000000L))
  }
}
