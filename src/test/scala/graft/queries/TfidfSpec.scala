package graft.queries

import graft.SparkSpec

/** Planted-keyword oracle for t_tfidf_topk: a term unique to one document
  * must be that document's top keyword over ubiquitous high-tf terms, and
  * the scores must equal the hand-computed integer surrogate.
  */
class TfidfSpec extends SparkSpec {

  test("unique rare term beats ubiquitous frequent term; exact scores") {
    import spark.implicits._
    // 'filler' appears in every doc (df=4, high tf); each doc i also
    // carries its own keyword once
    val docsIn = Seq(
      (0L, "filler filler filler zebra"),
      (1L, "filler filler filler quark"),
      (2L, "filler filler filler maple"),
      (3L, "filler filler filler prism"))
    val out = TextOps.tfidfTopKOn(docsIn.toDF("doc_id", "text"))
      .collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("rnk")) ->
        (r.getAs[String]("token"), r.getAs[Long]("tf"), r.getAs[Long]("df"),
          r.getAs[Long]("score")))
      .toMap
    val n = 4L
    val keyScore = 1L * ((1000000 * n) / 1)   // tf=1, df=1
    val fillScore = 3L * ((1000000 * n) / 4)  // tf=3, df=4
    assert(keyScore > fillScore)
    val keywords = Map(0L -> "zebra", 1L -> "quark", 2L -> "maple", 3L -> "prism")
    keywords.foreach { case (id, kw) =>
      assert(out((id, 1L)) === ((kw, 1L, 1L, keyScore)), s"doc $id rank 1")
      assert(out((id, 2L)) === (("filler", 3L, 4L, fillScore)), s"doc $id rank 2")
    }
    // only 2 distinct tokens per doc -> exactly 2 ranks, never a rank 3
    assert(out.keys.map(_._2).max === 2L)
  }
}
