package graft.queries

import graft.SparkSpec

/** Planted-corpus coverage for the round-10 corpus-signal additions:
  * incremental (delta) ingest dedup, unigram-LM scoring, and the
  * across-doc boilerplate fraction — hand-computed expectations driven
  * through the real operator cores.
  */
class CorpusSignalsSpec extends SparkSpec {

  test("stored LSH index: deltaNearDupFromIndex verdicts equal the inline deltaNearDupOn") {
    import spark.implicits._
    val tagged = TextOps.taggedForSpec(spark, "/root/testdata/sf0.001")
    val base = tagged.filter($"batch" === "base").select($"doc_id", $"text")
    val delta = tagged.filter($"batch" === "delta").select($"doc_id", $"text")
    val dir = java.nio.file.Files.createTempDirectory("graft-lsh-idx").toString
    TextOps.writeLshIndex(base, dir)
    val stored = TextOps.deltaNearDupFromIndex(delta, dir)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val inline = TextOps.deltaNearDupOn(tagged)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(stored === inline)
    assert(stored.values.exists(_ == "neardup_of_base"),
      "fixture should contain at least one cross-batch near-dup")
  }

  test("appendLshIndex: admitted delta docs reject THEIR OWN copies on the next ingest") {
    import spark.implicits._
    def doc(seed: Int): String = (1 to 12).map(i => s"a${seed}_$i").mkString(" ")
    val base = Seq((1L, doc(1)), (2L, doc(2))).toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("graft-lsh-append").toString
    TextOps.writeLshIndex(base, dir)
    // ingest 1: one base copy (flagged), one fresh doc (kept)
    val d1 = Seq((10L, doc(1)), (11L, doc(7))).toDF("doc_id", "text")
    val v1 = TextOps.deltaNearDupFromIndex(d1, dir)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(v1 === Map(10L -> "neardup_of_base", 11L -> "kept"))
    // fold ONLY the kept doc into the index
    TextOps.appendLshIndex(d1.filter($"doc_id" === 11L), dir)
    // ingest 2: a copy of the admitted doc 11 must now be rejected,
    // the original base still rejects, fresh still passes
    val d2 = Seq((20L, doc(7)), (21L, doc(2)), (22L, doc(9))).toDF("doc_id", "text")
    val v2 = TextOps.deltaNearDupFromIndex(d2, dir)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(v2 === Map(20L -> "neardup_of_base", 21L -> "neardup_of_base", 22L -> "kept"))
    // the merged count table is consistent: every bucket's n_base equals
    // a recount over the appended band rows
    import org.apache.spark.sql.functions.{count, lit}
    val recount = graft.sources.IndexManifest.readAppendOnly(spark, dir, "bands")
      .groupBy($"band", $"bkey").agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getInt(0), r.getStruct(1).toString) -> r.getLong(2)).toMap
    val stored = graft.sources.IndexManifest.readRewrite(spark, dir, "bucket_counts")
      .collect().map(r => (r.getInt(0), r.getStruct(1).toString) -> r.getLong(2)).toMap
    assert(stored === recount, "bucket_counts must equal a recount of bands")
  }

  test("deltaDedupOn: base collision, in-batch dup, and fresh content each verdict correctly") {
    import spark.implicits._
    val tagged = Seq(
      // base corpus
      (0L, "alpha beta gamma", "base"),
      (1L, "delta epsilon zeta", "base"),
      // delta batch
      (10L, "alpha beta gamma", "delta"), // exact copy of base doc 0
      (11L, "eta theta iota", "delta"), // fresh -> kept
      (12L, "eta theta iota", "delta"), // second copy inside the batch
      (13L, "kappa lambda mu", "delta"), // fresh -> kept
    ).toDF("doc_id", "text", "batch")
    val got = TextOps.deltaDedupOn(tagged).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("verdict")).toMap
    assert(got === Map(
      10L -> "dup_of_base",
      11L -> "kept",
      12L -> "dup_in_delta",
      13L -> "kept",
    ))
  }

  test("deltaDedupOn: a doc dup'd in base AND in delta reports dup_of_base (base wins)") {
    import spark.implicits._
    val tagged = Seq(
      (0L, "same text here", "base"),
      (10L, "same text here", "delta"),
      (11L, "same text here", "delta"),
    ).toDF("doc_id", "text", "batch")
    val got = TextOps.deltaDedupOn(tagged).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("verdict")).toMap
    assert(got === Map(10L -> "dup_of_base", 11L -> "dup_of_base"))
  }

  test("deltaNearDupOn: a near-identical delta doc collides with base; fresh vocab is kept") {
    import spark.implicits._
    def long(tag: String, n: Int) = (1 to n).map(i => s"$tag$i").mkString(" ")
    val baseText = long("w", 30)
    val tagged = Seq(
      (0L, baseText, "base"),
      (1L, long("z", 30), "base"),
      // exact copy: all 12 minhashes equal -> collides in every band
      (10L, baseText, "delta"),
      // disjoint vocabulary: zero shared shingles -> kept
      (11L, long("q", 30), "delta"),
    ).toDF("doc_id", "text", "batch")
    val got = TextOps.deltaNearDupOn(tagged).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("verdict")).toMap
    assert(got === Map(10L -> "neardup_of_base", 11L -> "kept"))
  }

  test("deltaNearDupOn: mega-bucket cap skips boilerplate collisions; tiny docs are kept") {
    import spark.implicits._
    val boiler = (1 to 30).map(i => s"b$i").mkString(" ")
    val base = (0 until 40).map(i => (i.toLong, boiler, "base"))
    val tagged = (base ++ Seq(
      (100L, boiler, "delta"), // collides only through the over-cap bucket
      (101L, "one two", "delta"), // < 3 tokens -> no shingles -> kept
    )).toDF("doc_id", "text", "batch")
    // every band bucket holds 41 members; cap=40 drops them all
    val got = TextOps.deltaNearDupOn(tagged, cap = 40).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("verdict")).toMap
    assert(got === Map(100L -> "kept", 101L -> "kept"))
    // with the cap above the bucket size the collision is seen again
    val got2 = TextOps.deltaNearDupOn(tagged, cap = 50).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("verdict")).toMap
    assert(got2(100L) === "neardup_of_base")
  }

  test("unigramLmOn: hand-computed mean-probability scores; common text outscores rare") {
    import spark.implicits._
    // corpus tokens: a a b | c  ->  cnt(a)=2 cnt(b)=1 cnt(c)=1, N=4
    val docs = Seq((0L, "a a b"), (1L, "c")).toDF("doc_id", "text")
    val got = TextOps.unigramLmOn(docs).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_toks"), r.getAs[Long]("sum_cnt"), r.getAs[Long]("score_ppm"))))
      .toMap
    // doc0: n=3, S=2+2+1=5, score = 5_000_000 / 12 = 416666
    // doc1: n=1, S=1,       score = 1_000_000 / 4  = 250000
    assert(got(0L) === ((3L, 5L, 416666L)))
    assert(got(1L) === ((1L, 1L, 250000L)))
  }

  test("unigramLmOn: all-identical docs score the maximum 1e6 ppm") {
    import spark.implicits._
    val docs = (0 until 5).map(i => (i.toLong, "x x x")).toDF("doc_id", "text")
    val got = TextOps.unigramLmOn(docs).collect()
    assert(got.length === 5)
    // every token is 'x': cnt=N, so mean probability is exactly 1
    assert(got.forall(_.getAs[Long]("score_ppm") === 1000000L))
  }

  test("boilerplateOn: shared template shingles raise boiler_pct; unique text stays 0") {
    import spark.implicits._
    // doc 0/1 share the shingle "x y z"; doc 2 is fully unique
    val sh = Seq(
      (0L, "x y z"), (0L, "y z w"),
      (1L, "x y z"), (1L, "y z q"),
      (2L, "p q r"),
    ).toDF("doc_id", "sh")
    val got = TextOps.boilerplateOn(sh).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_shingles"), r.getAs[Long]("n_shared"), r.getAs[Long]("boiler_pct"))))
      .toMap
    assert(got(0L) === ((2L, 1L, 50L)))
    assert(got(1L) === ((2L, 1L, 50L)))
    assert(got(2L) === ((1L, 0L, 0L)))
  }

  test("collocationsOn: hand-computed lift; support filter prunes rare bigrams") {
    import spark.implicits._
    // bigram "a b" x5 (support >= 5), "a c" x1 (pruned)
    val docs = ((0 until 5).map(i => (i.toLong, "a b")) :+ (5L, "a c")).toDF("doc_id", "text")
    val got = TextOps.collocationsOn(docs).collect()
    assert(got.length === 1)
    val r = got.head
    assert(r.getAs[String]("bigram") === "a b")
    // cnt_ab=5, cnt_a=6, cnt_b=5, N=12 -> lift = 1e6*5*12/(6*5) = 2_000_000
    assert(r.getAs[Long]("cnt_ab") === 5L)
    assert(r.getAs[Long]("lift_ppm") === 2000000L)
    assert(r.getAs[Long]("rnk") === 1L)
  }

  test("collocationsOn: an exclusive pair out-lifts a diluted one") {
    import spark.implicits._
    // "x y": x only ever precedes y. "p q": p also pairs with z half the time.
    val texts = Seq.fill(3)("x y") ++ Seq.fill(3)("p q") ++ Seq.fill(3)("p z")
    val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val got = TextOps.collocationsOn(docs, minCount = 1L).collect()
      .map(r => r.getAs[String]("bigram") -> r.getAs[Long]("lift_ppm")).toMap
    // N=18: lift(x y) = 1e6*3*18/(3*3) = 6e6 ; lift(p q) = 1e6*3*18/(6*3) = 3e6
    assert(got("x y") === 6000000L)
    assert(got("p q") === 3000000L)
    assert(got("x y") > got("p q"))
  }

  test("boilerplateOn: an exact mirror pair reports 100% on both sides") {
    import spark.implicits._
    val sh = Seq((0L, "a b c"), (0L, "b c d"), (1L, "a b c"), (1L, "b c d"))
      .toDF("doc_id", "sh")
    val got = TextOps.boilerplateOn(sh).collect()
    assert(got.length === 2)
    assert(got.forall(_.getAs[Long]("boiler_pct") === 100L))
  }
}
