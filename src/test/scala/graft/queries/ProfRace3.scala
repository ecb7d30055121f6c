package graft.queries

/** Third-stage probe: two concurrent PARQUET WRITES of the minhash
  * plan — shared Dataset object vs per-thread plan copies — read back
  * and compared to a sequential reference. Narrows the r22 overlap
  * corruption to the write path and to whether sharing the Dataset is
  * the trigger. Run: sbt "Test/runMain graft.queries.ProfRace3 [own]"
  */
object ProfRace3 {
  def main(args: Array[String]): Unit = {
    val own = args.contains("own")
    val s = graft.GraftSession.local("race3", "32")
    s.sparkContext.setLogLevel("ERROR")
    import s.implicits._
    def doc(seed: Int): String = (1 to 12).map(i => s"w${seed}_$i").mkString(" ")
    val base = Seq((1L, doc(1)), (2L, doc(2)), (11L, doc(7)), (12L, doc(8)))
      .toDF("doc_id", "text")
    def plan() = TextOps.minhashBandRows(TextOps.shinglesOfDf(base))
    val ref = plan().collect().map(_.toString).sorted.mkString("\n")
    def tmp(): String =
      java.nio.file.Files.createTempDirectory("race3").toString
    var bad = 0
    for (trial <- 1 to 20) {
      val shared = plan()
      val dirs = Seq(tmp(), tmp())
      val pool = java.util.concurrent.Executors.newFixedThreadPool(2)
      val futs = dirs.map { d =>
        pool.submit(new java.util.concurrent.Callable[Unit] {
          def call(): Unit =
            (if (own) plan() else shared).write.mode("overwrite").parquet(d)
        })
      }
      futs.foreach(_.get()); pool.shutdown()
      dirs.foreach { d =>
        val got = s.read.parquet(d).collect().map(_.toString).sorted.mkString("\n")
        if (got != ref) {
          bad += 1
          if (bad <= 2) println(s"PROBE3 trial $trial MISMATCH in $d:\n" +
            got.linesIterator.zip(ref.linesIterator)
              .filter { case (a, b) => a != b }.take(2)
              .map { case (a, b) => s"got $a\nexp $b" }.mkString("\n"))
        }
      }
    }
    println(s"PROBE3 done own=$own bad=$bad")
    s.stop()
  }
}
