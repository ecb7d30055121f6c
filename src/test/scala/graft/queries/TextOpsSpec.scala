package graft.queries

import graft.SparkSpec

/** Unit coverage for the TextOps internals the oracle queries can't reach
  * at test scale — the LSH mega-bucket guard needs a degenerate corpus.
  */
class TextOpsSpec extends SparkSpec {

  // 300 documents with IDENTICAL shingle sets: every band bucket holds all
  // 300 docs — the degenerate template corpus the guard exists for
  private def degenerateShingles = {
    import spark.implicits._
    val shingles = Seq("a b c", "b c d", "c d e")
    (1 to 300).flatMap(i => shingles.map(s => (i.toLong, s))).toDF("doc_id", "sh")
  }

  test("mega-bucket guard drops over-cap buckets entirely") {
    val pairs = TextOps.minhashPairs(degenerateShingles, cap = 100)
    assert(pairs.count() === 0)
  }

  test("buckets at or under the cap still pair-expand fully") {
    val pairs = TextOps.minhashPairs(degenerateShingles, cap = 300)
    // all docs collide in every band -> complete pair set, deduped
    assert(pairs.count() === 300L * 299 / 2)
    // doc_a < doc_b by construction
    assert(pairs.filter("doc_a >= doc_b").count() === 0)
  }
}
