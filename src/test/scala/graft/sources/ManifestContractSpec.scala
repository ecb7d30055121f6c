package graft.sources

import graft.SparkSpec
import graft.queries.TextOps

/** Round-15 manifest semantics: per-family format versions (a schema
  * bump in one stored-index family must not invalidate the others'
  * on-disk stock), the family tag (a reader pointed at a foreign
  * family's path fails fast instead of mis-reading its layout), the
  * commit-time single-writer guard on advance(), and the SCD2
  * replay fence on the stored last_day.
  */
class ManifestContractSpec extends SparkSpec {

  import spark.implicits._

  private def tmp(p: String) = java.nio.file.Files.createTempDirectory(p).toString

  test("family tag: a reader pointed at a foreign family's index fails fast") {
    val dir = tmp("fam-mix")
    IndexManifest.commit(dir, 0L, fmt = IndexManifest.Lsh)
    val e = intercept[IllegalStateException](
      IndexManifest.committedEpoch(dir, IndexManifest.Postings))
    assert(e.getMessage.contains("family 'lsh'"))
    assert(e.getMessage.contains("'postings'"))
    // the rightful family keeps resolving
    assert(IndexManifest.committedEpoch(dir, IndexManifest.Lsh) === 0L)
  }

  test("format versions are per family: a bump invalidates only its own stock") {
    val a = tmp("fam-a")
    val b = tmp("fam-b")
    IndexManifest.commit(a, 0L, fmt = IndexManifest.Format("lsh", 2))
    IndexManifest.commit(b, 0L, fmt = IndexManifest.Postings)
    // family 'lsh' ships format 3; its old stock fails fast with the
    // family named in the error
    val bumped = IndexManifest.Format("lsh", 3)
    val e = intercept[IllegalStateException](IndexManifest.committedState(a, bumped))
    assert(e.getMessage.contains("format_version 2"))
    assert(e.getMessage.contains("family 'lsh'"))
    // the OTHER family's reader never sees the bump
    assert(IndexManifest.committedEpoch(b, IndexManifest.Postings) === 0L)
  }

  test("legacy manifests (no family tag) stay readable by family-aware readers") {
    val dir = tmp("fam-legacy")
    java.nio.file.Files.write(
      java.nio.file.Paths.get(dir, "_graft_manifest.json"),
      """{"format_version": 2, "epoch": 4, "base_epoch": 1}""".getBytes("UTF-8"))
    val st = IndexManifest.committedState(dir, IndexManifest.Shingle)
    assert(st === IndexManifest.State(2, 4L, 1L, ""))
  }

  test("advance re-checks the committed epoch: replay and stale-stage commits fail loudly") {
    val dir = tmp("fam-advance")
    IndexManifest.commit(dir, 0L, fmt = IndexManifest.Cooccur)
    IndexManifest.advance(dir, 1L, IndexManifest.Cooccur) // the normal append
    assert(IndexManifest.committedEpoch(dir, IndexManifest.Cooccur) === 1L)
    // replaying epoch 1 after its commit: committed is 1, expected 0 — loud
    val e1 = intercept[java.util.ConcurrentModificationException](
      IndexManifest.advance(dir, 1L, IndexManifest.Cooccur))
    assert(e1.getMessage.contains("another writer"))
    // a stage computed against a snapshot another writer superseded
    intercept[java.util.ConcurrentModificationException](
      IndexManifest.advance(dir, 3L, IndexManifest.Cooccur))
    assert(IndexManifest.committedEpoch(dir, IndexManifest.Cooccur) === 1L,
      "failed advances must not move the committed state")
  }

  test("SCD2 append fences replays and misordered days on the stored last_day") {
    val dir = tmp("scd2-fence")
    TextOps.writeScd2(Seq((1L, "a")).toDF("doc_id", "text"), 0L, dir)
    TextOps.appendScd2Snapshot(Seq((1L, "a")).toDF("doc_id", "text"), 1L, dir)
    // replaying the COMMITTED day-1 append would emit a spurious
    // version (same-hash/same-day hits the supersede branch) — fenced
    val e = intercept[IllegalArgumentException](
      TextOps.appendScd2Snapshot(Seq((1L, "a")).toDF("doc_id", "text"), 1L, dir))
    assert(e.getMessage.contains("already folded"))
    // a regressed day is the same fence
    intercept[IllegalArgumentException](
      TextOps.appendScd2Snapshot(Seq((1L, "b")).toDF("doc_id", "text"), 0L, dir))
    // the fence is non-destructive: the next in-order day still folds
    TextOps.appendScd2Snapshot(Seq((1L, "b")).toDF("doc_id", "text"), 2L, dir)
    assert(IndexManifest.readRewrite(spark, dir, "meta", IndexManifest.Scd2)
      .first().getLong(0) === 2L)
    assert(TextOps.readScd2(spark, dir)
      .collect().map(_.getAs[Long]("version")).max === 2L)
  }
}
