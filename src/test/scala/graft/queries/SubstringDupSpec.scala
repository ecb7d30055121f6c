package graft.queries

import graft.SparkSpec

/** Differential property test for cross-document repeated-substring
  * detection: seeded random corpora with PLANTED shared spans driven
  * through the real operator ([[TextOps.substringDupOn]]) and compared
  * against an independent brute-force reimplementation of the contract —
  * stride-1 token windows of width W, a window duplicated iff its text
  * occurs more than once corpus-wide (across docs or within one), per-doc
  * duplicated coverage = merged-interval length of duplicated windows.
  */
class SubstringDupSpec extends SparkSpec {

  private val W = 20 // must match TextOps.winW

  /** Brute force: doc_id -> (n_tokens, n_wins, n_dup_wins, dup_tokens). */
  private def brute(docs: Seq[(Long, String)]): Map[Long, (Long, Long, Long, Long)] = {
    val wins = docs.flatMap { case (id, t) =>
      val tk = t.split(" ").filter(_.nonEmpty)
      if (tk.length >= W)
        (0 to tk.length - W).map(i => (id, i + 1L, tk.slice(i, i + W).mkString(" ")))
      else Nil
    }
    val cnt = wins.groupBy(_._3).view.mapValues(_.size).toMap
    val dupByDoc = wins.filter(w => cnt(w._3) > 1).groupBy(_._1)
    docs.map { case (id, t) =>
      val tk = t.split(" ").filter(_.nonEmpty)
      val starts = dupByDoc.getOrElse(id, Nil).map(_._2).sorted
      var cov = 0L
      var prevMax = 0L
      starts.foreach { s =>
        val fin = s + W - 1
        val lo = math.max(prevMax, s - 1)
        if (fin > lo) cov += fin - lo
        prevMax = math.max(prevMax, fin)
      }
      id -> (tk.length.toLong, math.max(tk.length - (W - 1), 0).toLong,
        starts.size.toLong, cov)
    }.toMap
  }

  private def run(docs: Seq[(Long, String)]): Map[Long, (Long, Long, Long, Long, Long, Boolean)] = {
    import spark.implicits._
    val df = spark.createDataset(docs.toIndexedSeq).toDF("doc_id", "text")
    TextOps.substringDupOn(df).collect().map { r =>
      r.getAs[Long]("doc_id") -> (
        r.getAs[Long]("n_tokens"), r.getAs[Long]("n_wins"),
        r.getAs[Long]("n_dup_wins"), r.getAs[Long]("dup_tokens"),
        r.getAs[Long]("dup_pct"), r.getAs[Boolean]("flag_dup"))
    }.toMap
  }

  test("two docs sharing one exact 20-token span: both covered by exactly that span") {
    val span = (1 to W).map(i => s"s$i").mkString(" ")
    val a = (1 to 85).map(i => s"a$i").mkString(" ") + " " + span + " " +
      (1 to 10).map(i => s"z$i").mkString(" ")
    val b = (1 to 25).map(i => s"b$i").mkString(" ") + " " + span
    val out = run(Seq((1L, a), (2L, b)))
    // exactly one duplicated window each (the planted span; stride-1
    // neighbors differ because the surrounding tokens differ)
    assert(out(1L)._3 == 1L && out(1L)._4 == W.toLong)
    assert(out(2L)._3 == 1L && out(2L)._4 == W.toLong)
    // doc 2: 45 tokens, 20 duplicated -> 44% -> flagged
    assert(out(2L)._5 == math.floor(100.0 * W / 45).toLong && out(2L)._6)
    assert(!out(1L)._6) // doc 1: 115 tokens -> 17% < 20 -> not flagged
  }

  test("within-doc verbatim repeat is duplicated with no second document") {
    val span = (1 to W).map(i => s"r$i").mkString(" ")
    val filler = (1 to 15).map(i => s"f$i").mkString(" ")
    val doc = span + " " + filler + " " + span
    val out = run(Seq((7L, doc)))
    // both occurrences' windows count as duplicated
    assert(out(7L)._3 >= 2L)
    assert(out(7L)._4 >= 2L * W)
  }

  /** Brute-force scrub: doc_id -> (n_tokens, n_scrubbed, clean_text),
    * keep-first-occurrence per duplicated window text.
    */
  private def bruteScrub(docs: Seq[(Long, String)]): Map[Long, (Long, Long, String)] = {
    val wins = docs.flatMap { case (id, t) =>
      val tk = t.split(" ").filter(_.nonEmpty)
      if (tk.length >= W)
        (0 to tk.length - W).map(i => (id, i + 1, tk.slice(i, i + W).mkString(" ")))
      else Nil
    }
    val byText = wins.groupBy(_._3)
    val scrub = wins.filter { case (id, st, txt) =>
      val occ = byText(txt)
      occ.size > 1 && occ.map(w => (w._1, w._2)).min != ((id, st))
    }.groupBy(_._1)
    docs.map { case (id, t) =>
      val tk = t.split(" ").filter(_.nonEmpty)
      val ivs = scrub.getOrElse(id, Nil).map(w => (w._2, w._2 + W - 1))
      val keptIdx = (1 to tk.length).filterNot(p => ivs.exists(v => p >= v._1 && p <= v._2))
      id -> (tk.length.toLong, (tk.length - keptIdx.size).toLong,
        keptIdx.map(p => tk(p - 1)).mkString(" "))
    }.toMap
  }

  private def runScrub(docs: Seq[(Long, String)]): Map[Long, (Long, Long, String)] = {
    import spark.implicits._
    val df = spark.createDataset(docs.toIndexedSeq).toDF("doc_id", "text")
    TextOps.substringScrubOn(df).collect().map { r =>
      r.getAs[Long]("doc_id") -> (
        r.getAs[Long]("n_tokens"), r.getAs[Long]("n_scrubbed"),
        r.getAs[String]("clean_text"))
    }.toMap
  }

  test("scrub keeps the first occurrence intact and cuts the later one") {
    val span = (1 to W).map(i => s"s$i").mkString(" ")
    val a = span + " " + (1 to 10).map(i => s"a$i").mkString(" ")
    val b = (1 to 5).map(i => s"b$i").mkString(" ") + " " + span
    val out = runScrub(Seq((1L, a), (2L, b)))
    // doc 1 owns the span (first occurrence) -> untouched
    assert(out(1L) == ((30L, 0L, a)))
    // doc 2 loses exactly the 20 span tokens
    assert(out(2L) == ((25L, W.toLong, (1 to 5).map(i => s"b$i").mkString(" "))))
  }

  test("scrub on random corpora with planted spans equals brute force") {
    val vocab = Array("a", "b", "c", "d", "e", "f", "g", "h", "i", "j")
    for (seed <- 6 to 10) {
      val rnd = new scala.util.Random(seed)
      val planted = Seq.tabulate(3)(_ =>
        Array.fill(W + rnd.nextInt(8))(vocab(rnd.nextInt(vocab.length))).mkString(" "))
      val docs: Seq[(Long, String)] = (0L until 30L).map { id =>
        val parts = (0 until 1 + rnd.nextInt(3)).map { _ =>
          if (rnd.nextInt(3) == 0) planted(rnd.nextInt(planted.length))
          else Array.fill(10 + rnd.nextInt(40))(vocab(rnd.nextInt(vocab.length))).mkString(" ")
        }
        (id, parts.mkString(" "))
      }
      val expected = bruteScrub(docs)
      val got = runScrub(docs)
      assert(got == expected, s"seed=$seed")
    }
  }

  test("delta-vs-base spans: only cross-set coverage counts, delta-delta repeats ignored") {
    import spark.implicits._
    val span = (1 to W).map(i => s"k$i").mkString(" ")
    val tagged = Seq(
      (1L, (1 to 10).map(i => s"b$i").mkString(" ") + " " + span, "base"),
      // delta doc embedding the base span after 5 fresh tokens
      (10L, (1 to 5).map(i => s"d$i").mkString(" ") + " " + span, "delta"),
      // two delta docs sharing a span that is NOT in the base -> no hits
      (11L, (1 to 30).map(i => s"e$i").mkString(" "), "delta"),
      (12L, (1 to 30).map(i => s"e$i").mkString(" "), "delta"),
    ).toDF("doc_id", "text", "batch")
    val out = TextOps.deltaSubstringOn(tagged).collect().map { r =>
      r.getAs[Long]("doc_id") -> (r.getAs[Long]("n_base_wins"),
        r.getAs[Long]("base_cov_tokens"), r.getAs[Boolean]("flag_dup"))
    }.toMap
    assert(out.keySet == Set(10L, 11L, 12L)) // base docs produce no rows
    assert(out(10L) == ((1L, W.toLong, true))) // 20/25 tokens covered
    assert(out(11L) == ((0L, 0L, false))) // delta-delta repeat: not counted
    assert(out(12L) == ((0L, 0L, false)))
  }

  test("random corpora with planted spans: operator equals brute force") {
    val vocab = Array("a", "b", "c", "d", "e", "f", "g", "h", "i", "j")
    for (seed <- 1 to 5) {
      val rnd = new scala.util.Random(seed)
      val planted = Seq.tabulate(3)(_ =>
        Array.fill(W + rnd.nextInt(10))(vocab(rnd.nextInt(vocab.length))).mkString(" "))
      val docs: Seq[(Long, String)] = (0L until 40L).map { id =>
        val parts = (0 until 1 + rnd.nextInt(3)).map { _ =>
          if (rnd.nextInt(3) == 0) planted(rnd.nextInt(planted.length))
          else Array.fill(10 + rnd.nextInt(40))(vocab(rnd.nextInt(vocab.length))).mkString(" ")
        }
        (id, parts.mkString(" "))
      }
      val expected = brute(docs)
      val got = run(docs)
      assert(got.keySet == expected.keySet, s"seed=$seed doc sets differ")
      expected.foreach { case (id, (nt, nw, ndw, cov)) =>
        val g = got(id)
        assert((g._1, g._2, g._3, g._4) == ((nt, nw, ndw, cov)),
          s"seed=$seed doc=$id got=$g expected=${(nt, nw, ndw, cov)}")
        assert(g._5 == math.floor(100.0 * cov / nt).toLong, s"seed=$seed doc=$id pct")
        assert(g._6 == (g._5 >= 20), s"seed=$seed doc=$id flag")
      }
    }
  }
}
