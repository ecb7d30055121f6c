package graft.queries

import graft.SparkSpec

/** The reason t_dedup_multimodal exists: a cross-modality chain —
  * A =exact= B =lexical= C =semantic= D — that NO single-modality pass
  * can collapse must resolve to one survivor through the composed plan.
  * Per-modality passes over the same corpus are run alongside to pin
  * that each sees only its own link of the chain.
  */
class MultimodalDedupSpec extends SparkSpec {

  test("a chain linked by three different modalities collapses to one keeper") {
    import spark.implicits._
    // one-hot embeddings: distinct docs are exactly orthogonal (cosine 0),
    // so the ONLY semantic pair is the planted twin — deterministic, no
    // seed-dependent stray pairs at the 0.25 threshold
    def basis(i: Int): Array[Float] = Array.tabulate(64)(j => if (j == i) 1f else 0f)
    def jitter(v: Array[Float]): Array[Float] =
      v.zipWithIndex.map { case (x, j) => x + (if (j == 0) 0.001f else 0f) }

    // texts: 25 distinct tokens each so MinHash shingles are well-formed
    def text(tag: String) = (1 to 25).map(i => s"$tag$i").mkString(" ")
    val a = text("chain")
    val b = a // exact duplicate of A
    val c = text("chain").replace("chain25", "mutated") // near-dup of B: 24/25 shared
    val dTxt = text("unrelated") // no lexical overlap with C at all
    val eTxt = text("bystander")

    // embeddings: C and D are paraphrase twins (cosine ~1); everyone else
    // owns their own basis dimension
    val cEmb = basis(40)
    val docs = ((0L until 16L).map(i => i -> text(s"filler${i}x")) ++
      Seq(20L -> a, 21L -> b, 22L -> c, 23L -> dTxt, 24L -> eTxt))
      .toDF("doc_id", "text")
    val emb = ((0L until 16L).map(i => i -> basis(i.toInt)) ++
      Seq(20L -> basis(20), 21L -> basis(21), 22L -> cEmb, 23L -> jitter(cEmb), 24L -> basis(24)))
      .toDF("vec_id", "embedding")
    graft.functions.GraftFunctions.registerDotD(spark)

    // each single modality sees exactly its own link
    val lex = TextOps.minhashPairs(TextOps.shinglesOfDf(docs)).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(lex.contains((21L, 22L)) || lex.contains((20L, 22L)),
      s"lexical pass must link C to the A/B text: $lex")
    assert(!lex.exists(p => p._1 == 23L || p._2 == 23L), "D shares no shingles")
    val sem = VectorOps.semanticPairs(
      emb.join(docs.select($"doc_id"), $"vec_id" === $"doc_id")
        .select($"vec_id", $"embedding")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(sem.contains((22L, 23L)), s"semantic pass must link C to D: $sem")

    // the composed resolution collapses the whole chain to keeper 20
    val out = VectorOps.multimodalDedupOn(docs, emb).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2), r.getBoolean(3)))
    assert(out.forall(_._4), "resolver must converge")
    val byDoc = out.map(r => r._1 -> r._2).toMap
    assert(byDoc(20L) === 20L && byDoc(21L) === 20L && byDoc(22L) === 20L && byDoc(23L) === 20L,
      s"chain must share rep 20: $byDoc")
    assert(out.count(_._3) === out.length - 3, "exactly B, C, D are dropped")
    assert(byDoc(24L) === 24L, "the bystander is untouched")
  }
}
