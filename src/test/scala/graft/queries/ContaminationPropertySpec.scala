package graft.queries

import graft.SparkSpec

/** Differential property test for the eval-contamination check: seeded
  * random corpora with PLANTED cross-split duplicates driven through the
  * real operator ([[CurationOps.contaminationOn]]) and compared field-by-
  * field against an independent brute-force reimplementation (Scala sets,
  * no Spark). The split assignment is a pure hash of doc_id, so the test
  * steers documents into train/val/test by CHOOSING ids whose md5 bucket
  * lands where the scenario needs them — planted leaks are then certain,
  * not probabilistic.
  */
class ContaminationPropertySpec extends SparkSpec {

  /** Scala mirror of TextOps.h60 % 1000 → split label. */
  private def splitOf(id: Long): String = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(id.toString.getBytes("UTF-8"))
      .map(b => f"$b%02x").mkString.take(15)
    val bucket = java.lang.Long.parseLong(hex, 16) % 1000
    if (bucket < 800) "train" else if (bucket < 900) "val" else "test"
  }

  private def shingles(text: String): Set[String] = {
    val tk = text.split(" ").filter(_.nonEmpty)
    if (tk.length < 3) Set.empty
    else tk.sliding(3).map(_.mkString(" ")).toSet
  }

  /** Brute force: (split, n_sh, n_overlap, overlap_pct, contaminated) per
    * non-train doc.
    */
  private def brute(docs: Seq[(Long, String)]): Map[Long, (String, Long, Long, Long, Boolean)] = {
    val trainSh = docs.collect { case (id, t) if splitOf(id) == "train" => shingles(t) }
      .foldLeft(Set.empty[String])(_ ++ _)
    docs.collect {
      case (id, t) if splitOf(id) != "train" =>
        val sh = shingles(t)
        val nSh = sh.size.toLong
        val nOv = (sh & trainSh).size.toLong
        val pct = if (nSh > 0) math.floor(100.0 * nOv / nSh).toLong else 0L
        id -> ((splitOf(id), nSh, nOv, pct, nSh > 0 && nOv * 5 >= nSh * 4))
    }.toMap
  }

  private def run(docs: Seq[(Long, String)]): Map[Long, (String, Long, Long, Long, Boolean)] = {
    import spark.implicits._
    val df = spark.createDataset(docs.toIndexedSeq).toDF("doc_id", "text")
    CurationOps.contaminationOn(df).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[String]("split"), r.getAs[Long]("n_sh"), r.getAs[Long]("n_overlap"),
          r.getAs[Long]("overlap_pct"), r.getAs[Boolean]("contaminated")))
      .toMap
  }

  test("random corpora with planted cross-split leaks: operator equals brute force") {
    // large vocab keeps BACKGROUND overlap near zero, so the planted leaks
    // are the only contamination — the test controls both sides of the flag
    val vocab = Array.tabulate(400)(i => s"w$i")
    for (seed <- 1 to 5) {
      val rnd = new scala.util.Random(100 + seed)
      val ids = (0L until 4000L).filter(_ => true)
      val trainIds = ids.filter(splitOf(_) == "train").take(30)
      val evalIds = ids.filter(splitOf(_) != "train").take(20)
      def freshText() = Array.fill(40)(vocab(rnd.nextInt(vocab.length))).mkString(" ")
      val trainDocs = trainIds.map(id => (id, freshText()))
      // plant: eval docs 0-4 are EXACT copies of train docs (full leak),
      // 5-9 share a half (partial leak), the rest are fresh (clean)
      val evalDocs = evalIds.zipWithIndex.map { case (id, i) =>
        if (i < 5) (id, trainDocs(i)._2)
        else if (i < 10) {
          val half = trainDocs(i)._2.split(" ").take(20).mkString(" ")
          (id, half + " " + freshText().split(" ").take(20).mkString(" "))
        } else (id, freshText())
      }
      val docs = (trainDocs ++ evalDocs).toSeq
      val got = run(docs)
      val want = brute(docs)
      assert(got === want, s"seed $seed")
      // the planted structure is detected: exact copies flagged, fresh not
      evalIds.zipWithIndex.foreach { case (id, i) =>
        if (i < 5) assert(got(id)._5, s"seed $seed: exact-copy doc $id must be flagged")
        if (i >= 10) assert(!got(id)._5, s"seed $seed: fresh doc $id must be clean")
      }
      // partial leaks sit strictly between: nonzero overlap, below 80%
      evalIds.zipWithIndex.collect { case (id, i) if i >= 5 && i < 10 => id }.foreach { id =>
        assert(got(id)._3 > 0, s"seed $seed: half-leak doc $id has overlap")
      }
    }
  }

  test("an all-train corpus yields an empty report; an all-eval corpus is all-clean") {
    val vocab = Array.tabulate(50)(i => s"v$i")
    val rnd = new scala.util.Random(7)
    def text() = Array.fill(30)(vocab(rnd.nextInt(vocab.length))).mkString(" ")
    val ids = (0L until 2000L)
    val allTrain = ids.filter(splitOf(_) == "train").take(10).map(id => (id, text())).toSeq
    assert(run(allTrain).isEmpty, "train docs are never reported")
    val allEval = ids.filter(splitOf(_) != "train").take(10).map(id => (id, text())).toSeq
    val got = run(allEval)
    assert(got.size === allEval.size)
    // no train side at all → zero overlap everywhere, nothing contaminated
    got.values.foreach { case (_, _, nOv, pct, flag) =>
      assert(nOv === 0L && pct === 0L && !flag)
    }
  }
}
