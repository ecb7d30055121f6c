package graft.queries

import org.apache.spark.sql.functions._

/** Paired A/B for the r22 stage/compact overlap (guide §2.6): the
  * append, forget and compact paths of the postings and LSH indexes
  * write 2-4 independent epoch components each, sequentially before
  * r22. Variant A pins `graft.overlap.sequential` (the pre-r22 shape);
  * variant B runs the live overlapped writers. Fresh roots per rep so
  * every rep pays the full lifecycle; alternating reps in ONE session.
  *
  * Run: sbt "Test/runMain graft.queries.ProfLifecycle"
  */
object ProfLifecycle {
  def main(args: Array[String]): Unit = {
    val s = graft.GraftSession.local("lcab", "32")
    s.sparkContext.setLogLevel("ERROR")
    import s.implicits._
    graft.functions.GraftFunctions.registerDotD(s)
    val d = "/root/testdata/sf0.1"
    val docs = graft.sources.Tables.documents(s, d)

    // the t_bm25_asof/forget + t_delta_neardup shape: build day 1,
    // append day 2, forget, compact — for both text index families
    def lifecycle(): Long = {
      val p = graft.sources.Scratch.dir("graft-lc-post")
      SearchOps.writePostingsIndex(docs.filter($"doc_id" % 10 =!= 3), p)
      SearchOps.appendPostingsIndex(docs.filter($"doc_id" % 10 === 3), p)
      SearchOps.deleteFromPostingsIndex(Seq(1L, 11L).toDF("doc_id"), p)
      SearchOps.compactPostingsIndex(s, p)
      val l = graft.sources.Scratch.dir("graft-lc-lsh")
      TextOps.writeLshIndex(docs.filter($"doc_id" % 10 =!= 3), l)
      TextOps.appendLshIndex(docs.filter($"doc_id" % 10 === 3), l)
      TextOps.deleteFromLshIndex(Seq(2L, 12L).toDF("doc_id"), l)
      TextOps.compactLshIndex(s, l)
      SearchOps.storedPostings(s, p).count() + TextOps.storedLshBands(s, l).count()
    }
    def seqRun(): Long = {
      System.setProperty("graft.overlap.sequential", "true")
      try lifecycle() finally System.clearProperty("graft.overlap.sequential")
    }

    seqRun(); lifecycle() // warm both
    val reps = 5
    val out = collection.mutable.Map("seq" -> List.empty[Double], "par" -> List.empty[Double])
    for (r <- 1 to reps; v <- Seq("seq", "par")) {
      System.gc()
      val t0 = System.nanoTime()
      val n = if (v == "seq") seqRun() else lifecycle()
      val dt = (System.nanoTime() - t0) / 1e9
      out(v) = out(v) :+ dt
      println(f"PROF lc-$v%-4s rep=$r $dt%.2f s rows=$n")
    }
    def med(xs: List[Double]) = xs.sorted.apply(xs.size / 2)
    val (a, b) = (med(out("seq")), med(out("par")))
    println(f"PROF lc-ab seq_median=$a%.2f par_median=$b%.2f ratio=${a / b}%.2f")
    s.stop()
  }
}
