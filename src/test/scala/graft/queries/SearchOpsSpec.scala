package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** SearchOps — brute-force scoring parity and fuzzy-match verification
  * against an independent in-JVM implementation.
  */
class SearchOpsSpec extends SparkSpec {

  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  private def docTokens: Array[(Long, Array[String])] =
    graft.sources.Tables.documents(spark, sf)
      .select($"doc_id", $"text")
      .collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" ").filter(_.nonEmpty))

  test("t_bool_search equals brute-force conjunctive match with summed tf") {
    val terms = Set("spark", "join", "window")
    val expect = docTokens.flatMap { case (id, tks) =>
      val tf = tks.filter(terms).groupBy(identity).view.mapValues(_.length.toLong).toMap
      if (tf.keySet == terms) Some(id -> tf.values.sum) else None
    }.toMap
    val got = Catalog.queries("t_bool_search")(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === expect)
    assert(got.nonEmpty)
  }

  test("t_tfidf_search equals brute-force integer tf-idf top-k") {
    val terms = Seq("spark", "join", "window")
    val toks = docTokens
    val n = toks.length.toLong
    val tf = toks.map { case (id, tks) =>
      id -> terms.map(t => t -> tks.count(_ == t).toLong).filter(_._2 > 0).toMap
    }.filter(_._2.nonEmpty)
    val df = terms.map(t => t -> tf.count(_._2.contains(t)).toLong).toMap
    val scores = tf.map { case (id, m) =>
      id -> m.map { case (t, f) => f * (n * 1000000L / df(t)) }.sum
    }
    val expect = scores.sortBy { case (id, sc) => (-sc, id) }.take(15)
    val got = Catalog.queries("t_tfidf_search")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got.toSeq === expect.toSeq)
  }

  test("stored postings index: pruned search equals the inline ranking") {
    val dir = java.nio.file.Files.createTempDirectory("graft-postings").toString
    val docs = graft.sources.Tables.documents(spark, sf)
    SearchOps.writePostingsIndex(docs, dir)

    // bucket routing parity: the driver-side hash must agree with the
    // engine-side h60 routing that laid out the directories
    val layout = new java.io.File(s"$dir/postings/epoch=0").listFiles()
      .filter(_.getName.startsWith("bucket=")).map(_.getName).toSet
    assert(layout.nonEmpty && layout.size <= SearchOps.indexBuckets)

    val terms = Seq("spark", "join", "window")
    val stored = SearchOps.tfidfSearchFromIndex(spark, dir, terms, 15)
    // partition pruning actually happened: the executed scan carries a
    // PartitionFilters entry on bucket
    val plan = stored.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("bucket"),
      s"expected bucket partition pruning in:\n$plan")
    val got = stored.collect().map(r => (r.getLong(0), r.getLong(1)))
    val inline = Catalog.queries("t_tfidf_search")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got.toSeq === inline.toSeq)

    // the SAME stored artifacts serve BM25 (dl denormalized on the
    // posting rows): ranked parity with the inline t_bm25_search, and
    // the same bucket pruning
    val bm = SearchOps.bm25SearchFromIndex(spark, dir, terms, 15)
    val bmPlan = bm.queryExecution.executedPlan.toString
    assert(bmPlan.contains("PartitionFilters") && bmPlan.contains("bucket"),
      s"expected bucket partition pruning in:\n$bmPlan")
    val bmGot = bm.collect().map(r => (r.getLong(0), r.getLong(1)))
    val bmInline = Catalog.queries("t_bm25_search")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(bmGot.toSeq === bmInline.toSeq)
  }

  test("phraseSearchFromIndex equals the inline phrase ranking; buckets prune") {
    val dir = java.nio.file.Files.createTempDirectory("graft-phrase-idx").toString
    SearchOps.writePostingsIndex(graft.sources.Tables.documents(spark, sf), dir)
    val stored = SearchOps.phraseSearchFromIndex(spark, dir, Seq("spark", "join"), 15)
    // the phrase path reads only its terms' bucket directories — the
    // whole point of storing positions (the inline form scans the corpus)
    val plan = stored.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("bucket"),
      s"expected bucket partition pruning in:\n$plan")
    val got = stored.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val inline = Catalog.queries("t_phrase_search")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq === inline.toSeq)
  }

  test("phraseSearchFromIndex: repeated-term, overlapping and longer phrases count exactly") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a b a b a"), // "a b a" at offsets 0 and 2 (overlapping) -> 2
      (2L, "a b a c"),   // -> 1
      (3L, "a a a a"),   // no "a b a"; "a a a" at 0,1 -> 2
      (4L, "b a b c"),   // -> 0
    ).toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("graft-phrase-tiny").toString
    SearchOps.writePostingsIndex(docs, dir)
    def run(phrase: Seq[String]) =
      SearchOps.phraseSearchFromIndex(spark, dir, phrase, 10)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    // repeated term in two slots reuses the same posting list shifted twice
    assert(run(Seq("a", "b", "a")) === Seq((1L, 2L, 1L), (2L, 1L, 2L)))
    assert(run(Seq("a", "a", "a")) === Seq((3L, 2L, 1L)))
    // single-term phrase degenerates to plain tf ranking
    assert(run(Seq("a")) === Seq((3L, 4L, 1L), (1L, 3L, 2L), (2L, 2L, 3L), (4L, 1L, 4L)))
    // phrase containing an unindexed term matches nothing
    assert(run(Seq("a", "zz")).isEmpty)
  }

  test("proximitySearchFromIndex equals the inline slop ranking; hand-checked pairs") {
    import spark.implicits._
    // hand-check the pair counting first (slop = 3, directional)
    val docs = Seq(
      (1L, "spark a join spark join"), // p1=[1,4] p2=[3,5]: 1->3, 4->5 => 2
      (2L, "join spark"),              // join BEFORE spark only => 0
      (3L, "spark a b c join"),        // distance 4 > slop => 0
      (4L, "spark join"),              // => 1
    ).toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("graft-prox-tiny").toString
    SearchOps.writePostingsIndex(docs, dir)
    val tiny = SearchOps.proximitySearchFromIndex(spark, dir, "spark", "join", 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(tiny === Seq((1L, 2L, 1L), (4L, 1L, 2L)))

    // fixture-corpus parity: stored twin == inline catalog ranking
    val big = java.nio.file.Files.createTempDirectory("graft-prox-idx").toString
    SearchOps.writePostingsIndex(graft.sources.Tables.documents(spark, sf), big)
    val stored = SearchOps.proximitySearchFromIndex(spark, big, "spark", "join", 15)
    val plan = stored.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("bucket"),
      s"expected bucket partition pruning in:\n$plan")
    val got = stored.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val inline = Catalog.queries("t_proximity_search")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq === inline.toSeq)
  }

  test("property: phrase and proximity counts equal brute force on random corpora") {
    import spark.implicits._
    // 60 docs over a 4-token vocab, lengths 0..12 (empty docs included —
    // the ANSI element_at guard's hard case); seeded for reproducibility
    val rnd = new scala.util.Random(140814)
    val vocab = Vector("a", "b", "c", "d")
    val docs = (1L to 60L).map { id =>
      id -> Vector.fill(rnd.nextInt(13))(vocab(rnd.nextInt(vocab.length)))
    }
    val df = docs.map { case (id, tks) => (id, tks.mkString(" ")) }.toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("graft-prop-idx").toString
    SearchOps.writePostingsIndex(df, dir)

    def brutePhrase(tks: Vector[String], ph: Seq[String]): Long =
      if (tks.length < ph.length) 0L
      else (0 to tks.length - ph.length).count(i => ph.indices.forall(j => tks(i + j) == ph(j))).toLong
    def bruteNear(tks: Vector[String], t1: String, t2: String, slop: Int): Long = {
      val p1 = tks.indices.filter(tks(_) == t1)
      val p2 = tks.indices.filter(tks(_) == t2)
      p1.map(x => p2.count(y => y > x && y <= x + slop).toLong).sum
    }

    for (ph <- Seq(Seq("a", "b"), Seq("a", "a"), Seq("b", "a", "b"))) {
      val expect = docs.map { case (id, tks) => id -> brutePhrase(tks, ph) }
        .filter(_._2 > 0).sortBy { case (id, tf) => (-tf, id) }
      val got = SearchOps.phraseSearchFromIndex(spark, dir, ph, 1000)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
      assert(got === expect, s"phrase $ph")
    }
    for ((t1, t2) <- Seq(("a", "b"), ("c", "c"), ("d", "a"))) {
      val expect = docs.map { case (id, tks) => id -> bruteNear(tks, t1, t2, 3) }
        .filter(_._2 > 0).sortBy { case (id, tf) => (-tf, id) }
      val got = SearchOps.proximitySearchFromIndex(spark, dir, t1, t2, 1000)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
      assert(got === expect, s"near ($t1, $t2)")
    }
    // the random fixture must include empty and single-token docs
    assert(docs.exists(_._2.isEmpty) && docs.exists(_._2.length == 1))
  }

  test("appendPostingsIndex equals a union-corpus rebuild; search parity holds") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val docs = graft.sources.Tables.documents(spark, sf).select($"doc_id", $"text")
    val maxId = docs.agg(max($"doc_id")).head().getLong(0)
    val arrivals = docs.filter($"doc_id" % 5 === 0).limit(40)
      .select(($"doc_id" + maxId + 1).as("doc_id"), $"text")
    val appended = java.nio.file.Files.createTempDirectory("postings-app").toString
    SearchOps.writePostingsIndex(docs, appended)
    SearchOps.appendPostingsIndex(arrivals, appended)
    val rebuilt = java.nio.file.Files.createTempDirectory("postings-reb").toString
    SearchOps.writePostingsIndex(docs.unionByName(arrivals), rebuilt)
    def terms(dir: String) = graft.sources.IndexManifest.readRewrite(spark, dir, "terms")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(terms(appended) === terms(rebuilt), "merged df table must equal a rebuild's")
    def corpus(dir: String) = {
      val r = graft.sources.IndexManifest.readRewrite(spark, dir, "corpus").first()
      (r.getAs[Long]("n_docs"), r.getAs[Long]("total_tokens"))
    }
    assert(corpus(appended) === corpus(rebuilt))
    def postings(dir: String) =
      graft.sources.IndexManifest.readAppendOnly(spark, dir, "postings")
        .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("dl"),
          r.getAs[String]("t"), r.getAs[Long]("tf"),
          r.getAs[Seq[Int]]("positions"), r.getAs[Number]("bucket").longValue)).toSet
    assert(postings(appended) === postings(rebuilt))
    val q = Seq("spark", "join", "window")
    def top(dir: String) = SearchOps.tfidfSearchFromIndex(spark, dir, q, 15)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(top(appended) === top(rebuilt))
    def topBm(dir: String) = SearchOps.bm25SearchFromIndex(spark, dir, q, 15)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(topBm(appended) === topBm(rebuilt),
      "BM25 over the appended index must equal the rebuild (df, dl AND corpus totals merged)")
    // a SECOND successive append must still equal one big rebuild —
    // the df merge is associative, not just correct once
    val arrivals2 = docs.filter($"doc_id" % 7 === 0).limit(25)
      .select(($"doc_id" + 2 * (maxId + 1)).as("doc_id"), $"text")
    SearchOps.appendPostingsIndex(arrivals2, appended)
    val rebuilt2 = java.nio.file.Files.createTempDirectory("postings-reb2").toString
    SearchOps.writePostingsIndex(docs.unionByName(arrivals).unionByName(arrivals2), rebuilt2)
    assert(terms(appended) === terms(rebuilt2))
    assert(corpus(appended) === corpus(rebuilt2))
    assert(postings(appended) === postings(rebuilt2))
    assert(top(appended) === top(rebuilt2))
  }

  test("entity resolution on planted typos: close variants match, far ones don't") {
    import org.apache.spark.sql.functions.{col, count, lit, element_at, split, levenshtein}
    // a tiny synthetic part table: canonical names + 1-edit typos (same
    // block), plus a 4-edit variant that must NOT match
    val parts = Seq(
      "steel widget", "steol widget",      // 1 edit apart
      "brass gadget", "bras gadget",       // 1 edit
      "green gizmo", "graan gizmo",        // 2 edits
      "purple gizmo",                      // 4+ edits from graan/green
      "lonely sprocket",                   // no partner in block
    ).zipWithIndex.map { case (n, i) => (i.toLong, n) }.toDF("p_partkey", "p_name")
    val names = parts.groupBy(col("p_name")).agg(count(lit(1)).as("n_rows"))
      .withColumn("blk", element_at(split(col("p_name"), " "), -1))
    val a = names.select(col("blk"), col("p_name").as("name_a"))
    val b = names.select(col("blk"), col("p_name").as("name_b"))
    val got = a.join(b, "blk")
      .filter(col("name_a") < col("name_b"))
      .withColumn("dist", levenshtein(col("name_a"), col("name_b"), 2).cast("long"))
      .filter(col("dist") >= 0)
      .collect().map(r => (r.getString(1), r.getString(2))).toSet
    assert(got.contains(("steel widget", "steol widget")))
    assert(got.contains(("bras gadget", "brass gadget")))
    assert(got.contains(("graan gizmo", "green gizmo")))
    assert(!got.exists { case (x, y) => Set(x, y) == Set("purple gizmo", "green gizmo") })
    assert(!got.exists { case (x, y) => x.contains("sprocket") || y.contains("sprocket") })
  }

  test("entity canon equals brute-force union-find over the match graph") {
    def lev2(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1)(i => Array.tabulate(b.length + 1)(j =>
        if (i == 0) j else if (j == 0) i else 0))
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    val names = graft.sources.Tables.part(spark, sf)
      .select($"p_name").distinct().collect().map(_.getString(0))
    val parent = scala.collection.mutable.Map(names.map(n => n -> n): _*)
    def find(x: String): String =
      if (parent(x) == x) x else { val r = find(parent(x)); parent(x) = r; r }
    for {
      a <- names; b <- names
      if a < b && a.split(" ").last == b.split(" ").last && lev2(a, b) <= 2
    } { val (ra, rb) = (find(a), find(b)); if (ra != rb) parent(ra) = rb }
    val expect = names.map { n =>
      val root = find(n)
      n -> names.filter(m => find(m) == root).min // lexicographic canon
    }.toMap
    val got = Catalog.queries("t_entity_canon")(spark, sf)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(got === expect)
    // clusters actually formed (some canon != self)
    assert(got.exists { case (n, c) => n != c })
  }

  test("t_entity_resolution pairs are verified by an independent edit-distance") {
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1)(i => Array.tabulate(b.length + 1)(j =>
        if (i == 0) j else if (j == 0) i else 0))
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    val names = graft.sources.Tables.part(spark, sf)
      .groupBy($"p_name").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // independent candidate set: same blocking rule, local verification
    val expect = (for {
      a <- names.keys; b <- names.keys
      if a < b && a.split(" ").last == b.split(" ").last && lev(a, b) <= 2
    } yield (a, b)).toSet
    val got = Catalog.queries("t_entity_resolution")(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(got.map(p => (p._1, p._2)).toSet === expect)
    got.foreach { case (a, b, dist, na, nb) =>
      assert(dist === lev(a, b).toLong)
      assert(na === names(a) && nb === names(b))
    }
    assert(got.nonEmpty)
  }

  test("hybrid stored search: independent as-of pins replay the exact pre-append fusion") {
    graft.functions.GraftFunctions.registerDotD(spark)
    val docsDf = graft.sources.Tables.documents(spark, sf)
    val emb = graft.sources.Tables.embeddings(spark, sf)
    val maxDoc = docsDf.agg(max($"doc_id")).head().getLong(0)
    val maxVec = emb.agg(max($"vec_id")).head().getLong(0)
    val pdir = java.nio.file.Files.createTempDirectory("hyb-post").toString
    val vdir = java.nio.file.Files.createTempDirectory("hyb-ivfpq").toString
    SearchOps.writePostingsIndex(docsDf, pdir)
    VectorOps.writeIvfPqIndex(emb, vdir)
    val probe = emb.filter($"vec_id" === 0L)
      .select($"vec_id".as("query_id"), $"embedding")
    val terms = Seq("spark", "join", "window")
    def fuse(aS: Option[Long], aD: Option[Long]) =
      SearchOps.hybridSearchFromIndexes(spark, pdir, vdir, terms, probe, 10, aS, aD)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getLong(3), r.getLong(4))).toSet
    val epoch0 = fuse(None, None)
    // both indexes grow on their OWN cadences: a term-stuffed doc that
    // must enter the sparse top list, and each probe's exact twin on the
    // dense side
    import spark.implicits._
    SearchOps.appendPostingsIndex(
      Seq((maxDoc + 1, ("spark join window " * 8).trim)).toDF("doc_id", "text"), pdir)
    VectorOps.appendIvfPqIndex(
      probe.select(lit(maxVec + 1).as("vec_id"), $"embedding",
        lit(0).cast("int").as("label")), vdir)
    // the recorded (0, 0) pair replays the original fusion exactly
    assert(fuse(Some(0L), Some(0L)) === epoch0)
    // each leg's pin is independent: pinning only one leg moves only
    // the other list
    val sparseMoved = fuse(None, Some(0L))
    val denseMoved = fuse(Some(0L), None)
    assert((sparseMoved !== epoch0) && sparseMoved.exists(_._1 == maxDoc + 1),
      "head sparse leg must admit the stuffed doc")
    assert((denseMoved !== epoch0) && denseMoved.exists(_._1 == maxVec + 1),
      "head dense leg must admit the planted twin")
    assert(fuse(None, None) === fuse(None, None), "head fusion deterministic")
  }
}
