package graft.queries

/** Paired A/B for the r21 verdict's Next #3: t_dedup_multimodal's three
  * edge branches (exact hash window, MinHash-LSH shingles, IVF-cell
  * semantic pairs) all consume the fanned docs scan, plus the final
  * labels join — does ONE lazy `localCheckpoint(false)` on the shared
  * docs head win, or does the materialization barrier cost more than
  * the concurrent-stage rescans (the checkpoint rule; the r19 persist
  * probe measured 0.98x for the eager `.persist()` form)? Alternating
  * reps in ONE session. Adoption gate per the verdict: >= 1.15x, else
  * commit the negative.
  *
  * Run: sbt "Test/runMain graft.queries.ProfMM22"
  */
object ProfMM22 {
  def main(args: Array[String]): Unit = {
    val s = graft.GraftSession.local("mm22", "32")
    s.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.1"
    graft.functions.GraftFunctions.registerDotD(s)
    val emb = graft.sources.Tables.embeddings(s, d)

    def plain(): Long =
      VectorOps.multimodalDedupOn(TextOps.fannedDocsOf(s, d), emb).count()
    def ckpt(): Long =
      VectorOps.multimodalDedupOn(
        TextOps.fannedDocsOf(s, d).localCheckpoint(false), emb).count()

    plain(); ckpt() // warm both
    val reps = 5
    val out = collection.mutable.Map("plain" -> List.empty[Double], "ckpt" -> List.empty[Double])
    for (r <- 1 to reps; v <- Seq("plain", "ckpt")) {
      System.gc()
      val t0 = System.nanoTime()
      val n = if (v == "plain") plain() else ckpt()
      val dt = (System.nanoTime() - t0) / 1e9
      out(v) = out(v) :+ dt
      println(f"PROF mm22-$v%-6s rep=$r $dt%.2f s rows=$n")
    }
    def med(xs: List[Double]) = xs.sorted.apply(xs.size / 2)
    val (p, c) = (med(out("plain")), med(out("ckpt")))
    println(f"PROF mm22-ab plain=$p%.2f ckpt=$c%.2f ratio=${p / c}%.2f")
    s.stop()
  }
}
