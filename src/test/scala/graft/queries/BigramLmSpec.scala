package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The reason t_bigram_lm exists, planted: a scrambled bag of the SAME
  * common words scores level with fluent text under the unigram model but
  * far below it under the bigram model — plus an independent hand-computed
  * oracle for the MLE conditional probabilities.
  */
class BigramLmSpec extends SparkSpec {

  test("fluent text outranks scrambled word-salad; unigram cannot tell them apart") {
    import spark.implicits._
    // 8 fluent docs repeat the same 3 sentences; 1 scrambled doc uses the
    // same multiset of words in an order the corpus never produces
    val fluent = "the cat sat on the mat and the dog ran to the cat"
    val salad = "cat the mat sat the on dog and to ran the cat the"
    val docsIn = (0 until 8).map(i => (i.toLong, fluent)) :+ (99L, salad)
    val df = docsIn.toDF("doc_id", "text")

    val bi = bigramLmOnMap(df)
    // unigram: identical token multiset -> identical mean probability
    val uni = TextOps.unigramLmOn(df).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("score_ppm")).toMap
    assert(uni(0L) === uni(99L), "unigram is order-blind by construction")
    // bigram: fluency is visible
    assert(bi(0L) > 3 * bi(99L),
      s"fluent ${bi(0L)} should dwarf scrambled ${bi(99L)}")
  }

  private def bigramLmOnMap(df: org.apache.spark.sql.DataFrame): Map[Long, Long] =
    TextOps.bigramLmOn(df).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("bigram_ppm")).toMap

  test("scores equal the hand-computed MLE bigram model") {
    import spark.implicits._
    val docsIn = Seq(
      (1L, "a b a b"),
      (2L, "a b c"),
      (3L, "c a"),
      (4L, "solo"), // 1 token -> no bigrams -> no output row
    )
    val out = TextOps.bigramLmOn(docsIn.toDF("doc_id", "text")).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_bigrams"), r.getAs[Long]("sum_ppm"), r.getAs[Long]("bigram_ppm")))
      .toMap
    // corpus bigrams: doc1 [a b, b a, a b], doc2 [a b, b c], doc3 [c a]
    // cnt: (a b)=3, (b a)=1, (b c)=1, (c a)=1
    // ctx = bigram-HEAD totals (so p sums to 1 per context): a=3, b=2, c=1
    val p = Map(
      "a b" -> 1000000L * 3 / 3,
      "b a" -> 1000000L * 1 / 2,
      "b c" -> 1000000L * 1 / 2,
      "c a" -> 1000000L * 1 / 1)
    def score(bgs: Seq[String]) = {
      val s = bgs.map(p).sum
      (bgs.size.toLong, s, s / bgs.size)
    }
    assert(out === Map(
      1L -> score(Seq("a b", "b a", "a b")),
      2L -> score(Seq("a b", "b c")),
      3L -> score(Seq("c a"))))
    assert(!out.contains(4L))
  }
}
