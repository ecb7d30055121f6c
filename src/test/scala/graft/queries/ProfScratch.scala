package graft.queries

/** Paired A/B (r21): scratch-artifact writes on /tmp (virtio-backed)
  * vs /dev/shm (tmpfs) — the Scratch-root sibling of the round-?
  * spark.local.dir measurement (t_clean_corpus 2.9-38 s on /tmp vs
  * 1.4-2.0 s on tmpfs). Drives the e_zorder_scan lifecycle (layout
  * write + pruned read-back) at sf0.1, alternating target roots in one
  * session. Run: sbt "Test/runMain graft.queries.ProfScratch"
  */
object ProfScratch {
  def main(args: Array[String]): Unit = {
    val s = graft.GraftSession.local("scratchab", "32")
    s.sparkContext.setLogLevel("ERROR")
    import s.implicits._
    val d = "/root/testdata/sf0.1"
    val evs = graft.sources.Tables.events(s, d)
    def run(base: String): Long = {
      val dir = java.nio.file.Files.createTempDirectory(
        java.nio.file.Paths.get(base), "graft-zorder-ab").toString
      LayoutOps.writeZorderLayout(evs, dir)
      val n = LayoutOps.zorderBoxScan(s, dir, 3L, 9L, 19730L, 19739L)
        .select($"event_id", $"user_id", $"day").count()
      graft.sources.Scratch.deleteRecursively(java.nio.file.Paths.get(dir))
      n
    }
    // warm both
    run("/tmp"); run("/dev/shm")
    val out = collection.mutable.Map("tmp" -> List.empty[Double], "shm" -> List.empty[Double])
    for (r <- 1 to 5; (tag, base) <- Seq("tmp" -> "/tmp", "shm" -> "/dev/shm")) {
      System.gc()
      val t0 = System.nanoTime()
      val n = run(base)
      val dt = (System.nanoTime() - t0) / 1e9
      out(tag) = out(tag) :+ dt
      println(f"PROF zorder-$tag%-4s rep=$r $dt%.2f s rows=$n")
    }
    def med(xs: List[Double]) = xs.sorted.apply(xs.size / 2)
    println(f"PROF zorder-ab tmp=${med(out("tmp"))}%.2f shm=${med(out("shm"))}%.2f " +
      f"ratio=${med(out("tmp")) / med(out("shm"))}%.2f")
    s.stop()
  }
}
