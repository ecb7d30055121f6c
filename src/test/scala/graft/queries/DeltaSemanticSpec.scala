package graft.queries

import graft.SparkSpec

/** Planted base/delta embedding sets through the real t_delta_semantic
  * plan: a delta paraphrase of a base vector is flagged, an independent
  * delta vector is kept, and delta-delta twins are BOTH kept — the
  * cross-set-only contract (delta-internal resolution belongs to the
  * next full pass, same split as t_delta_dedup/t_delta_neardup).
  */
class DeltaSemanticSpec extends SparkSpec {

  test("delta vs base verdicts: paraphrase flagged, novel kept, delta-delta ignored") {
    import spark.implicits._
    def basis(i: Int): Array[Float] = Array.tabulate(64)(j => if (j == i) 1f else 0f)
    def jitter(v: Array[Float]): Array[Float] =
      v.zipWithIndex.map { case (x, j) => x + (if (j == 0) 0.001f else 0f) }

    // base: centroids 0-15 plus vector 30 on basis 5
    val base = (0L until 16L).map(i => (i, basis(i.toInt), "base")) :+
      ((30L, basis(5), "base"))
    // delta: 85 = paraphrase of base 30; 90 = novel direction; 91/92 =
    // twins of each other but of nothing in base. Novel directions use
    // dims >= 40 — orthogonal to every base vector INCLUDING the
    // centroids (a delta on a centroid's own basis would legitimately be
    // a near-dup of that base centroid vector)
    val delta = Seq(
      (85L, jitter(basis(5)), "delta"),
      (90L, basis(41), "delta"),
      (91L, basis(40), "delta"),
      (92L, jitter(basis(40)), "delta"))
    val tagged = (base ++ delta).toDF("vec_id", "embedding", "batch")
    graft.functions.GraftFunctions.registerDotD(spark)

    val out = VectorOps.deltaSemanticOn(tagged).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out === Map(
      85L -> "neardup_of_base",
      90L -> "kept",
      91L -> "kept",
      92L -> "kept"), s"verdicts: $out")
  }
}
