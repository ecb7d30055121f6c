package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sources.IndexManifest

/** De-indexing through the stored postings index: after a delete, every
  * search AND every ranking statistic must equal an index rebuilt
  * without the docs (tombstones alone are not enough — BM25's idf and
  * length normalization would keep pricing the ghosts in); a killed
  * delete is invisible; reindex-after-delete resolves to the new
  * postings; compaction makes removal physical.
  */
class PostingsDeleteSpec extends SparkSpec {

  import spark.implicits._

  private def tmp(p: String) = java.nio.file.Files.createTempDirectory(p).toString

  // docs built from the standing query terms so searches return rows
  private val corpus = Seq(
    1L -> "spark join window spark filter",
    2L -> "join window shuffle state",
    3L -> "spark spark spark join",
    4L -> "window window join spark stream",
    5L -> "unrelated tokens only here",
    6L -> "spark window checkpoint join window")
  private val terms = Seq("spark", "join", "window")

  private def search(dir: String) =
    SearchOps.bm25SearchFromIndex(spark, dir, terms, 10)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toSeq

  private def stats(dir: String) = {
    val c = IndexManifest.readRewrite(spark, dir, "corpus", IndexManifest.Postings).first()
    val t = IndexManifest.readRewrite(spark, dir, "terms", IndexManifest.Postings)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    (c.getLong(0), c.getLong(1), t)
  }

  test("delete equals a rebuild without the docs: search, stats, kill drill") {
    val dir = tmp("pidx-del")
    val reb = tmp("pidx-reb")
    SearchOps.writePostingsIndex(corpus.toDF("doc_id", "text"), dir)
    val before = search(dir)

    // kill drill: a staged delete must not move reads or stats
    SearchOps.stagePostingsDelete(Seq(3L).toDF("doc_id"), dir, 1L)
    assert(IndexManifest.committedEpoch(dir, IndexManifest.Postings) === 0L)
    assert(search(dir) === before, "uncommitted tombstones leaked into search")

    // committed delete of docs 3 (term-heavy) and 5 (token-less wrt terms)
    SearchOps.deleteFromPostingsIndex(Seq(3L, 5L).toDF("doc_id"), dir)
    SearchOps.writePostingsIndex(
      corpus.filterNot(c => c._1 == 3L || c._1 == 5L).toDF("doc_id", "text"), reb)
    assert(search(dir) === search(reb),
      "post-delete ranking must equal a rebuild without the docs")
    assert(stats(dir) === stats(reb),
      "df / n_docs / total_tokens must give back the deleted mass")
    // phrase search through the same resolved postings
    def phrase(d: String) = SearchOps.phraseSearchFromIndex(
      spark, d, Seq("spark", "join"), 10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(phrase(dir) === phrase(reb))
  }

  test("reindex-after-delete resolves to the new postings; compaction is physical") {
    val dir = tmp("pidx-reidx")
    SearchOps.writePostingsIndex(corpus.toDF("doc_id", "text"), dir)
    // forget doc 3, then REINDEX it with corrected content
    SearchOps.deleteFromPostingsIndex(Seq(3L).toDF("doc_id"), dir)
    assert(!search(dir).exists(_._1 == 3L))
    SearchOps.appendPostingsIndex(Seq(3L -> "join window").toDF("doc_id", "text"), dir)
    val reb = tmp("pidx-reidx-reb")
    SearchOps.writePostingsIndex(
      (corpus.filterNot(_._1 == 3L) :+ (3L -> "join window")).toDF("doc_id", "text"), reb)
    assert(search(dir) === search(reb),
      "epoch precedence: the reindexed doc must score on its NEW postings only")
    assert(stats(dir) === stats(reb))

    // compact: tombstoned rows physically gone, reads unchanged
    SearchOps.compactPostingsIndex(spark, dir)
    val st = IndexManifest.committedState(dir, IndexManifest.Postings)
    assert(st.baseEpoch === st.epoch)
    val raw = spark.read.option("basePath", s"$dir/postings")
      .parquet(s"$dir/postings").filter(col("epoch") === st.epoch)
    assert(raw.filter(col("doc_id") === 3L && col("t") === lit("spark")).count() === 0L,
      "compaction must drop the forgotten postings physically")
    assert(search(dir) === search(reb))
    // still appendable after the compacted fold
    SearchOps.appendPostingsIndex(Seq(9L -> "spark spark").toDF("doc_id", "text"), dir)
    assert(search(dir).exists(_._1 == 9L))
  }
}
