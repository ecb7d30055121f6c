package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Independent oracle for t_dsir_weight: an in-test reimplementation of
  * the hashed-unigram importance ratio (same md5-bucket hash, same
  * add-one smoothing, same IEEE expression shape) over a planted
  * target/raw corpus, plus the ranking property the operator exists for —
  * documents written in the target domain's vocabulary must outrank
  * documents written in the raw-only vocabulary.
  */
class DsirSpec extends SparkSpec {

  /** The engine's 60-bit md5 hash, reproduced independently. */
  private def h60(s: String): Long = {
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex.substring(0, 15), 16)
  }

  test("weights equal the hand-computed ratio model; target vocab outranks raw") {
    import spark.implicits._
    // target docs speak {alpha, beta}; raw-only docs speak {gamma, delta};
    // one mixed doc sits between
    val docsIn = Seq(
      (0L, "alpha beta alpha beta alpha", true),
      (1L, "beta alpha beta alpha", true),
      (2L, "gamma delta gamma delta gamma delta", false),
      (3L, "delta gamma delta", false),
      (4L, "alpha gamma", false),
    )
    val df = docsIn.toDF("doc_id", "text", "is_t")
    val out = TextOps.dsirWeightsOn(df, col("is_t"))
      .collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_toks"), r.getAs[Long]("sum_ppm"), r.getAs[Long]("dsir_ppm")))
      .toMap

    // independent model: bucket counts over ALL tokens (c_r) and target
    // tokens (c_t), add-one smoothing, B = 256, same expression shape
    val B = 256
    val tokRows = docsIn.flatMap { case (id, text, t) =>
      text.split(" ").filter(_.nonEmpty).map(tok => (id, tok, t))
    }
    val cr = tokRows.groupBy { case (_, tok, _) => h60(tok) % B }
      .view.mapValues(_.size.toLong).toMap
    val ct = tokRows.filter(_._3).groupBy { case (_, tok, _) => h60(tok) % B }
      .view.mapValues(_.size.toLong).toMap
    val nR = tokRows.size.toLong
    val nT = tokRows.count(_._3).toLong
    def rppm(b: Long): Long =
      math.floor(1000000 * ((ct.getOrElse(b, 0L) + 1.0) / (nT + B))
        / ((cr.getOrElse(b, 0L) + 1.0) / (nR + B))).toLong
    docsIn.foreach { case (id, text, _) =>
      val toks = text.split(" ").filter(_.nonEmpty)
      val sum = toks.map(t => rppm(h60(t) % B)).sum
      assert(out(id) === ((toks.length.toLong, sum, sum / toks.length)),
        s"doc $id")
    }
    // ranking: pure-target docs above the mixed doc above pure-raw docs
    assert(out(0L)._3 > out(4L)._3 && out(1L)._3 > out(4L)._3)
    assert(out(4L)._3 > out(2L)._3 && out(4L)._3 > out(3L)._3)
  }

  test("weights are deterministic across runs (stable hash, no rand)") {
    import spark.implicits._
    val df = (0 until 30)
      .map(i => (i.toLong, s"tok$i tok${i % 7} tok${i % 3}", i % 5 == 0))
      .toDF("doc_id", "text", "is_t")
    val a = TextOps.dsirWeightsOn(df, col("is_t")).collect().map(_.toSeq).toSet
    val b = TextOps.dsirWeightsOn(df, col("is_t")).collect().map(_.toSeq).toSet
    assert(a === b)
  }
}
