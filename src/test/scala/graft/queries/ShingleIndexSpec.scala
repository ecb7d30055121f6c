package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sources.IndexManifest

/** Stored shingle-df index: additive append parity, brute-force novelty,
  * the day-2 admit-then-reject loop, the summing compactor, and the
  * kill drill.
  */
class ShingleIndexSpec extends SparkSpec {

  import spark.implicits._

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  private def countsOf(dir: String): Map[String, Long] =
    TextOps.storedShingleDf(spark, dir)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap

  private def shinglesScala(text: String): Set[String] = {
    val tk = text.split(" ").filter(_.nonEmpty)
    (0 to tk.length - 3).map(i => s"${tk(i)} ${tk(i + 1)} ${tk(i + 2)}").toSet
  }

  test("append equals a union rebuild; novelty equals brute force; tiny docs drop") {
    val base = Seq(
      (1L, "a b c d e"), (2L, "c d e f"), (3L, "x y z w")).toDF("doc_id", "text")
    val d1 = Seq((10L, "b c d x")).toDF("doc_id", "text")
    val inc = tmp("shingle-inc")
    TextOps.writeShingleIndex(base, inc)
    TextOps.appendShingleIndex(d1, inc)
    val reb = tmp("shingle-reb")
    TextOps.writeShingleIndex(base.unionByName(d1), reb)
    assert(countsOf(inc) === countsOf(reb),
      "additive epochs must sum to the union-corpus counts")

    // brute-force novelty of a fresh probe against the grown index
    val probe = Seq(
      (20L, "a b c d q"),   // shingles: 2 known ('a b c','b c d'), 1 novel
      (21L, "q r s t"),     // all novel
      (22L, "c d"),         // < 3 tokens: no shingles, drops out
    ).toDF("doc_id", "text")
    val baseShingles = (Seq("a b c d e", "c d e f", "x y z w", "b c d x"))
      .flatMap(shinglesScala).toSet
    val got = TextOps.deltaNoveltyFromIndex(probe, inc)
      .collect().map(r => r.getLong(0) ->
        ((r.getAs[Long]("n_shingles"), r.getAs[Long]("n_known"),
          r.getAs[Long]("novelty_ppm")))).toMap
    val expect = Seq((20L, "a b c d q"), (21L, "q r s t")).map { case (id, t) =>
      val sh = shinglesScala(t)
      val known = sh.count(baseShingles).toLong
      id -> ((sh.size.toLong, known, (sh.size - known) * 1000000L / sh.size))
    }.toMap
    assert(got === expect)
    assert(!got.contains(22L), "a sub-3-token doc has no shingles")

    // day-2 loop: fold the novel probe in; its copy now scores 0
    TextOps.appendShingleIndex(probe.filter($"doc_id" === 21L), inc)
    val copy = TextOps.deltaNoveltyFromIndex(
      Seq((30L, "q r s t")).toDF("doc_id", "text"), inc).collect().head
    assert(copy.getAs[Long]("novelty_ppm") === 0L,
      "an admitted doc's copy must not look novel again")
  }

  test("deltaNoveltyFromIndex equals the oracle-gated inline operator on the hash split") {
    val sf = "/root/testdata/sf0.001"
    val tagged = TextOps.taggedForSpec(spark, sf)
    val idx = tmp("shingle-parity")
    TextOps.writeShingleIndex(
      tagged.filter($"batch" === "base").select($"doc_id", $"text"), idx)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getAs[Long]("n_shingles"),
        r.getAs[Long]("n_known"), r.getAs[Long]("novelty_ppm"))).toSet
    val stored = rows(TextOps.deltaNoveltyFromIndex(
      tagged.filter($"batch" === "delta").select($"doc_id", $"text"), idx))
    val inline = rows(Catalog.queries("t_delta_novelty")(spark, sf))
    assert(stored === inline,
      "stored screen must equal the oracle-gated inline operator")
    assert(inline.nonEmpty && inline.exists(_._4 > 0L) && inline.exists(_._3 > 0L),
      "fixture must contain both novel and known shingles")
  }

  test("noveltyBatchScorer follows an index append mid-stream") {
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val dir = tmp("shingle-stream")
    TextOps.writeShingleIndex(
      Seq((1L, "a b c d")).toDF("doc_id", "text"), dir)
    val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long)]
    val mem = MemoryStream[(Long, String)]
    val q = mem.toDF().toDF("doc_id", "text").writeStream
      .outputMode("append")
      .foreachBatch(TextOps.noveltyBatchScorer(dir) { (scored, batchId) =>
        out.synchronized {
          out ++= scored.collect()
            .map(r => (batchId, r.getLong(0), r.getAs[Long]("novelty_ppm")))
        }
        ()
      })
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("ckpt-nvl").toString)
      .start()
    try {
      mem.addData(Seq((10L, "q r s t"))) // all novel against {a b c d}
      q.processAllAvailable()
      // fold the arrival in mid-stream; the NEXT batch must see it
      TextOps.appendShingleIndex(Seq((10L, "q r s t")).toDF("doc_id", "text"), dir)
      mem.addData(Seq((20L, "q r s t"))) // copy: 0 novelty under fresh stats
      q.processAllAvailable()
    } finally q.stop()
    val byDoc = out.map(t => t._2 -> t._3).toMap
    assert(byDoc(10L) === 1000000L, "pre-append batch: fully novel")
    assert(byDoc(20L) === 0L,
      "post-append batch must score against the ADVANCED counts")
  }

  test("forget equals a rebuild; zero-df shingles read unknown; compaction drops them") {
    val base = Seq(
      (1L, "a b c d e"), (2L, "c d e f"), (3L, "x y z w")).toDF("doc_id", "text")
    val dir = tmp("shingle-forget")
    TextOps.writeShingleIndex(base, dir)
    // forget doc 3: its unique shingles ("x y z", "y z w") reach df 0;
    // "c d e" (shared by docs 1 and 2) must stay at df 1 after doc 2 goes
    TextOps.forgetShingleDocs(Seq((3L, "x y z w")).toDF("doc_id", "text"), dir)
    val reb = tmp("shingle-forget-reb")
    TextOps.writeShingleIndex(base.filter(col("doc_id") =!= 3L), reb)
    assert(countsOf(dir) === countsOf(reb),
      "negated-count epoch must sum to the rebuild-without-the-doc counts")
    assert(!countsOf(dir).contains("x y z"),
      "a forgotten-to-zero shingle must not read as known")
    // the novelty screen sees the forgotten shingles as unseen again
    val probe = Seq((20L, "x y z w")).toDF("doc_id", "text")
    val nv = TextOps.deltaNoveltyFromIndex(probe, dir)
      .collect().map(r => (r.getLong(0), r.getAs[Long]("n_known"))).toMap
    assert(nv(20L) === 0L, "copy of the forgotten doc must score fully novel")
    // partial overlap: forget doc 2 — "c d e" survives via doc 1
    TextOps.forgetShingleDocs(Seq((2L, "c d e f")).toDF("doc_id", "text"), dir)
    assert(countsOf(dir)("c d e") === 1L)
    assert(!countsOf(dir).contains("d e f"))
    // compaction drops the zeroed rows physically
    TextOps.compactShingleIndex(spark, dir)
    val st = IndexManifest.committedState(dir, IndexManifest.Shingle)
    assert(st.baseEpoch === st.epoch)
    val raw = spark.read.option("basePath", s"$dir/shingle_counts")
      .parquet(s"$dir/shingle_counts")
      .filter(col("epoch") === st.epoch)
      .collect().map(r => r.getAs[String]("sh") -> r.getAs[Long]("n")).toMap
    assert(!raw.contains("x y z") && !raw.contains("d e f"),
      "zero-df rows must be physically dropped by the summing fold")
    assert(raw.values.forall(_ > 0L))
  }

  test("summing compactor: counts equal, one row per shingle, floor raised; kill-safe") {
    val base = Seq((1L, "a b c d"), (2L, "b c d e")).toDF("doc_id", "text")
    val d1 = Seq((10L, "a b c e")).toDF("doc_id", "text")
    val dir = tmp("shingle-compact")
    TextOps.writeShingleIndex(base, dir)
    TextOps.appendShingleIndex(d1, dir)
    val before = countsOf(dir)
    assert(before("a b c") === 2L, "shared shingle counted across epochs")

    // kill drill: stage an append without committing
    TextOps.stageShingleAppend(Seq((20L, "a b c")).toDF("doc_id", "text"), dir, 9L)
    assert(countsOf(dir) === before, "uncommitted stage leaked")

    TextOps.compactShingleIndex(spark, dir)
    assert(countsOf(dir) === before, "compaction changed the summed counts")
    val st = IndexManifest.committedState(dir)
    assert(st.baseEpoch === st.epoch && st.baseEpoch >= 2L)
    // one physical row per shingle again (the epochs were re-summed)
    val rows = IndexManifest.readAppendOnly(spark, dir, "shingle_counts").count()
    assert(rows === before.size.toLong)
    // still appendable after
    TextOps.appendShingleIndex(Seq((30L, "e f g h")).toDF("doc_id", "text"), dir)
    assert(countsOf(dir)("e f g") === 1L)
    assert(countsOf(dir)("a b c") === 2L)
  }
}
