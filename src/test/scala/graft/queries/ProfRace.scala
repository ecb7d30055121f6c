package graft.queries

/** Determinism probe: evaluate the minhash band plan from several
  * driver threads at once and compare against a sequential reference —
  * isolates whether the r22 overlap's concurrent actions on one logical
  * plan can produce divergent values (the IndexManifestSpec failure
  * class). Run: sbt "Test/runMain graft.queries.ProfRace"
  */
object ProfRace {
  def main(args: Array[String]): Unit = {
    val s = graft.GraftSession.local("race", "32")
    s.sparkContext.setLogLevel("ERROR")
    import s.implicits._
    def doc(seed: Int): String = (1 to 12).map(i => s"w${seed}_$i").mkString(" ")
    val base = Seq((1L, doc(1)), (2L, doc(2)), (11L, doc(7)), (12L, doc(8)))
      .toDF("doc_id", "text")
    val ref = TextOps.minhashBandRows(TextOps.shinglesOfDf(base))
      .collect().map(_.toString).sorted.mkString("\n")
    var bad = 0
    for (trial <- 1 to 30) {
      val rows = TextOps.minhashBandRows(TextOps.shinglesOfDf(base))
      val pool = java.util.concurrent.Executors.newFixedThreadPool(4)
      val futs = (1 to 4).map { _ =>
        pool.submit(new java.util.concurrent.Callable[String] {
          def call(): String = rows.collect().map(_.toString).sorted.mkString("\n")
        })
      }
      val outs = futs.map(_.get())
      pool.shutdown()
      outs.foreach { o =>
        if (o != ref) {
          bad += 1
          if (bad <= 2) println(s"PROBE TRIAL $trial MISMATCH:\n" +
            o.linesIterator.zip(ref.linesIterator)
              .filter { case (a, b) => a != b }.take(3)
              .map { case (a, b) => s"got $a\nexp $b" }.mkString("\n"))
        }
      }
    }
    println(s"PROBE done bad=$bad")
    s.stop()
  }
}
