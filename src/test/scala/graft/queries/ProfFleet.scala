package graft.queries

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Paired A/B for the round-22 stored-fleet concurrency change (guide
  * §2.6 overlap; VERDICT r21 "Next round" item 2): the certFleet /
  * icatFleet build chains ran their independent roots SEQUENTIALLY —
  * each root is many small jobs (small parquet writes + manifest
  * commits) whose cost is the local job floor, so the box idles through
  * every root's tail. Variant A inlines the pre-r22 sequential chain;
  * variant B drives the same chain through
  * [[CurationOps.buildConcurrently]]. Fresh scratch roots per rep so
  * every rep pays the FULL build; alternating reps in ONE session (the
  * ProfServe/ProfIterAB discipline).
  *
  * Run: sbt "Test/runMain graft.queries.ProfFleet"
  */
object ProfFleet {
  def main(args: Array[String]): Unit = {
    val s = graft.GraftSession.local("fleetab", "32")
    s.sparkContext.setLogLevel("ERROR")
    import s.implicits._
    graft.functions.GraftFunctions.registerDotD(s)
    val d = "/root/testdata/sf0.1"
    val docs = graft.sources.Tables.documents(s, d)
    val emb = graft.sources.Tables.embeddings(s, d)

    // certFleet shape: five independent index builds + the sequential
    // erasure fan-out + the certificate read (the t_erasure_cert row).
    def certTargets(): Erasure.DocTargets = Erasure.DocTargets(
      postings = Some(graft.sources.Scratch.dir("graft-fab-post")),
      lsh = Some(graft.sources.Scratch.dir("graft-fab-lsh")),
      ivfPq = Some(graft.sources.Scratch.dir("graft-fab-ivfpq")),
      bq = Some(graft.sources.Scratch.dir("graft-fab-bq")),
      sq8 = Some(graft.sources.Scratch.dir("graft-fab-sq8")))
    def finish(t: Erasure.DocTargets): Long = {
      Erasure.forgetDocs(Seq(4L, 14L, 24L).toDF("doc_id"), t)
      Erasure.certificate(s, t, Seq(4L, 14L, 24L, 5L, 15L, 25L).toDF("doc_id")).count()
    }
    // variant A = the FULL pre-r22 shape: sequential roots AND
    // sequential component writes (graft.overlap.sequential disables
    // Overlap.run inside the writers for the duration of the rep)
    def seqRun(): Long = {
      System.setProperty("graft.overlap.sequential", "true")
      try {
        val t = certTargets()
        SearchOps.writePostingsIndex(docs, t.postings.get)
        TextOps.writeLshIndex(docs, t.lsh.get)
        VectorOps.writeIvfPqIndex(emb, t.ivfPq.get)
        VectorOps.writeBqIndex(emb, t.bq.get)
        VectorOps.writeSq8Index(emb, t.sq8.get)
        finish(t)
      } finally System.clearProperty("graft.overlap.sequential")
    }
    def parRun(): Long = {
      val t = certTargets()
      CurationOps.buildConcurrently(
        "postings" -> (() => SearchOps.writePostingsIndex(docs, t.postings.get)),
        "lsh" -> (() => TextOps.writeLshIndex(docs, t.lsh.get)),
        "ivfpq" -> (() => VectorOps.writeIvfPqIndex(emb, t.ivfPq.get)),
        "bq" -> (() => VectorOps.writeBqIndex(emb, t.bq.get)),
        "sq8" -> (() => VectorOps.writeSq8Index(emb, t.sq8.get)))
      finish(t)
    }

    // warm both once (JIT + codegen + file-index caches)
    seqRun(); parRun()
    val reps = 5
    val out = collection.mutable.Map("seq" -> List.empty[Double], "par" -> List.empty[Double])
    for (r <- 1 to reps; v <- Seq("seq", "par")) {
      System.gc()
      val t0 = System.nanoTime()
      val n = if (v == "seq") seqRun() else parRun()
      val dt = (System.nanoTime() - t0) / 1e9
      out(v) = out(v) :+ dt
      println(f"PROF fleet-$v%-4s rep=$r $dt%.2f s rows=$n")
    }
    def med(xs: List[Double]) = xs.sorted.apply(xs.size / 2)
    val (a, b) = (med(out("seq")), med(out("par")))
    println(f"PROF fleet-ab seq_median=$a%.2f par_median=$b%.2f ratio=${a / b}%.2f")
    s.stop()
  }
}
