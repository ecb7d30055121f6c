package graft.queries

/** Paired A/B for the round-19 verdict's Next #7: `multimodalDedupOn`
  * reads its docs frame in all three edge generators (exact hash, LSH
  * banded, semantic join) plus the final labels join — does CACHING the
  * fanned docs across the generators pay at sf0.1, or are the rescans
  * effectively free (they are embarrassingly parallel file reads)?
  * Alternating reps in ONE session (the ProfServe/ProfFiltered
  * discipline: probe-vs-probe claims need paired reps, never two
  * sessions). Run via `sbt "Test/runMain graft.queries.ProfMMPersist"`.
  * Decision rule per the verdict: adopt the persist only at >= 1.3x;
  * otherwise record the honest negative in SCALING.md.
  */
object ProfMMPersist {
  def main(args: Array[String]): Unit = {
    val s = graft.GraftSession.local("mmpersist", "32")
    s.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.1"
    graft.functions.GraftFunctions.registerDotD(s)
    val emb = graft.sources.Tables.embeddings(s, d)

    def plain(): Long =
      VectorOps.multimodalDedupOn(TextOps.fannedDocsOf(s, d), emb).count()
    def persisted(): Long = {
      val docs = TextOps.fannedDocsOf(s, d).persist()
      try { docs.count(); VectorOps.multimodalDedupOn(docs, emb).count() }
      finally docs.unpersist(blocking = true)
    }

    // warm both paths once (JIT + codegen + file-index caches)
    plain(); persisted()
    val reps = 4
    val out = collection.mutable.Map("plain" -> List.empty[Double],
      "persist" -> List.empty[Double])
    for (r <- 1 to reps; v <- Seq("plain", "persist")) {
      System.gc()
      val t0 = System.nanoTime()
      val n = if (v == "plain") plain() else persisted()
      val dt = (System.nanoTime() - t0) / 1e9
      out(v) = out(v) :+ dt
      println(f"PROF mm-$v%-8s rep=$r $dt%.2f s rows=$n")
    }
    def med(xs: List[Double]) = xs.sorted.apply(xs.size / 2)
    val (p, c) = (med(out("plain")), med(out("persist")))
    println(f"PROF mm-persist-ab plain_median=$p%.2f persist_median=$c%.2f ratio=${p / c}%.2f")
    s.stop()
  }
}
