package graft.sources

import graft.SparkSpec
import graft.queries.{SearchOps, VectorOps}

/** Snapshot export: a clone pinned at an epoch must serve exactly the
  * pinned view through the family's own read APIs, and — the point —
  * keep serving it after the SOURCE compacts and vacuums that epoch
  * out of existence (time travel alone dies with the janitor).
  */
class SnapshotExportSpec extends SparkSpec {

  import spark.implicits._

  private def tmp(p: String) = java.nio.file.Files.createTempDirectory(p).toString

  private val dayOne = Seq(
    1L -> "spark join window spark filter",
    2L -> "join window shuffle state",
    3L -> "spark spark spark join")
  private val dayTwo = Seq(
    4L -> "window window join spark stream",
    5L -> "spark window checkpoint join window")
  private val terms = Seq("spark", "join", "window")

  private def search(dir: String, asOf: Option[Long] = None) =
    SearchOps.bm25SearchFromIndex(spark, dir, terms, 10, asOf)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toSeq

  test("postings clone at a past epoch serves the pinned view, and outlives source vacuum") {
    val src = tmp("snap-src")
    SearchOps.writePostingsIndex(dayOne.toDF("doc_id", "text"), src)
    SearchOps.appendPostingsIndex(dayTwo.toDF("doc_id", "text"), src)
    val headView = search(src)
    val pinnedView = search(src, asOf = Some(0L))
    assert(headView !== pinnedView, "fixture must make the two epochs distinguishable")

    // clone epoch 0 (the training run's recorded epoch) and the head
    val relDst = tmp("snap-rel"); val headDst = tmp("snap-head")
    val relState = IndexMaintenance.exportSnapshot(spark, src, relDst, asOf = Some(0L))
    IndexMaintenance.exportSnapshot(spark, src, headDst)
    assert(relState.epoch === 0L && relState.family === "postings")
    assert(search(relDst) === pinnedView, "the clone's HEAD is the pinned view")
    assert(search(headDst) === headView)

    // source moves on: compaction rebases the floor, vacuum deletes the
    // superseded epochs — the source can no longer replay epoch 0...
    SearchOps.compactPostingsIndex(spark, src)
    IndexManifest.vacuum(src, IndexManifest.Postings)
    val refused = intercept[IllegalArgumentException] { search(src, asOf = Some(0L)) }
    assert(refused.getMessage.contains("below the floor were compacted away"))
    // ...but the release artifact still serves exactly what the run read
    assert(search(relDst) === pinnedView,
      "the exported snapshot must be immune to the source's maintenance schedule")
  }

  test("ivfpq clone copies all three component shapes and serves identically") {
    val emb = (0L until 64L)
      .map(i => (i, Array.fill(16)(new scala.util.Random(i).nextGaussian().toFloat)))
      .toDF("vec_id", "embedding")
    val src = tmp("snap-pq-src"); val dst = tmp("snap-pq-dst")
    VectorOps.writeIvfPqIndex(emb, src)
    val st = IndexMaintenance.exportSnapshot(spark, src, dst)
    assert(st.family === "ivfpq")
    // the clone carries epoch= slices (codes, dels), gen= dirs
    // (centroids), and the un-versioned codewords — all three shapes
    val queries = emb.filter($"vec_id" < 3L)
      .select($"vec_id".as("query_id"), $"embedding")
    val a = VectorOps.ivfPqSearchFromIndex(spark, src, queries)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(3))).sorted.toSeq
    val b = VectorOps.ivfPqSearchFromIndex(spark, dst, queries)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(3))).sorted.toSeq
    assert(a === b, "the clone must rank byte-for-byte like the source")
  }

  test("layout clone resolves tombstones and replays within-window as-of like the source") {
    import org.apache.spark.sql.functions._
    val src = tmp("snap-lay-src")
    val evs = graft.sources.Tables.events(spark, "/root/testdata/sf0.001")
    graft.queries.LayoutOps.writeEventTable(evs.filter($"user_id" < 40L), src)
    graft.queries.LayoutOps.appendEventTable(
      evs.filter($"user_id" >= 40L && $"user_id" < 60L), src, nFiles = 2)
    graft.queries.LayoutOps.forgetEventTableUsers(
      Seq(7L).toDF("user_id"), src) // epoch 2: a dels slice
    def rows(dir: String, asOf: Option[Long] = None) =
      graft.queries.LayoutOps.readEventTable(spark, dir, asOf)
        .select($"event_id").collect().map(_.getLong(0)).toSet
    val dst = tmp("snap-lay-dst")
    IndexMaintenance.exportSnapshot(spark, src, dst)
    assert(rows(dst) === rows(src),
      "the clone's resolved view (data minus tombstones) must equal the source's")
    assert(rows(dst).nonEmpty && rows(dst, Some(1L)) === rows(src, Some(1L)),
      "as-of pins WITHIN the cloned window replay on the clone (user 7 still visible)")
    assert(rows(dst, Some(1L)) !== rows(dst),
      "the fixture must make the pre-forget epoch distinguishable")
  }

  test("cascade-pair export: a recorded epoch pair replays the exact serve from the clones") {
    import org.apache.spark.sql.functions._
    val rnd = new scala.util.Random(912)
    def vec() = Array.fill(64)(rnd.nextGaussian().toFloat)
    val base = (0L until 30L).map(i => (i, vec()))
    val extra = (100L until 105L).map(i => (i, vec()))
    def df(rows: Seq[(Long, Array[Float])]) =
      spark.createDataset(rows).toDF("vec_id", "embedding")
    val bq = tmp("snap-cp-bq"); val sq = tmp("snap-cp-sq8")
    VectorOps.writeBqIndex(df(base), bq)
    VectorOps.writeSq8Index(df(base), sq)
    // the serve a training run logged: pair (0, 0), before this append
    VectorOps.appendCascadeDurable(df(extra), bq, sq, tmp("snap-cp-intent"))
    val corpus = df(base ++ extra)
    val reqs = df(base.take(3)).select($"vec_id".as("query_id"), $"embedding")
    def serve(b: String, q: String, bA: Option[Long], qA: Option[Long]) =
      VectorOps.searchCascadeIndex(reqs, b, q, corpus,
        excludeSelf = true, bqAsOf = bA, sq8AsOf = qA)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(3))).sorted.toSeq
    val logged = serve(bq, sq, Some(0L), Some(0L))
    assert(logged !== serve(bq, sq, None, None),
      "fixture must make the pinned pair distinguishable from the head")

    val bqC = tmp("snap-cp-bqc"); val sqC = tmp("snap-cp-sqc")
    IndexMaintenance.exportCascadePair(spark, bq, sq, bqC, sqC,
      bqAsOf = Some(0L), sq8AsOf = Some(0L))
    assert(serve(bqC, sqC, None, None) === logged,
      "the cloned pair's HEAD serve must equal the logged pinned serve")
    // destinations validate before either copy: a dirty SECOND root
    // means the FIRST is never written either
    val dirty = tmp("snap-cp-dirty")
    java.nio.file.Files.write(
      java.nio.file.Paths.get(dirty, "stray"), Array[Byte](1))
    val clean = tmp("snap-cp-clean")
    intercept[IllegalArgumentException] {
      IndexMaintenance.exportCascadePair(spark, bq, sq, clean, dirty)
    }
    assert(scala.util.Using.resource(
        java.nio.file.Files.list(java.nio.file.Paths.get(clean)))(
        !_.iterator().hasNext),
      "no half-exported pair: the first destination must stay untouched")
    // and a bad SECOND SOURCE (or pin) fails before the FIRST copy too —
    // the hazard is a committed readable half-pair, worse than a crash
    val clean2 = tmp("snap-cp-clean2")
    intercept[IllegalStateException] {
      IndexMaintenance.exportCascadePair(
        spark, bq, tmp("snap-cp-bare"), clean2, tmp("snap-cp-out2"))
    }
    assert(scala.util.Using.resource(
        java.nio.file.Files.list(java.nio.file.Paths.get(clean2)))(
        !_.iterator().hasNext),
      "a bad second source must not leave a committed first clone")
    val clean3 = tmp("snap-cp-clean3")
    intercept[IllegalArgumentException] {
      IndexMaintenance.exportCascadePair(
        spark, bq, sq, clean3, tmp("snap-cp-out3"), sq8AsOf = Some(99L))
    }
    assert(scala.util.Using.resource(
        java.nio.file.Files.list(java.nio.file.Paths.get(clean3)))(
        !_.iterator().hasNext),
      "an out-of-window second pin must not leave a committed first clone")
    // same-or-nested destinations refuse before anything is written —
    // the first clone's manifest would make the shared root "readable"
    val shared = tmp("snap-cp-shared")
    val exSame = intercept[IllegalArgumentException] {
      IndexMaintenance.exportCascadePair(spark, bq, sq, shared, shared)
    }
    assert(exSame.getMessage.contains("distinct"))
    val exNest = intercept[IllegalArgumentException] {
      IndexMaintenance.exportCascadePair(spark, bq, sq, shared, s"$shared/sq8")
    }
    assert(exNest.getMessage.contains("distinct"))
    assert(scala.util.Using.resource(
        java.nio.file.Files.list(java.nio.file.Paths.get(shared)))(
        !_.iterator().hasNext))
  }

  test("export refuses a non-empty destination and an uncommitted source") {
    val src = tmp("snap-ref-src")
    SearchOps.writePostingsIndex(dayOne.toDF("doc_id", "text"), src)
    val dirty = tmp("snap-ref-dirty")
    java.nio.file.Files.write(
      java.nio.file.Paths.get(dirty, "stray"), Array[Byte](1))
    val ex = intercept[IllegalArgumentException] {
      IndexMaintenance.exportSnapshot(spark, src, dirty)
    }
    assert(ex.getMessage.contains("not empty"))
    val bare = tmp("snap-ref-bare") // no manifest: a crashed build
    val ex2 = intercept[IllegalStateException] {
      IndexMaintenance.exportSnapshot(spark, bare, tmp("snap-ref-out"))
    }
    assert(ex2.getMessage.contains("nothing exportable"))
    // a destination that exists as a FILE refuses with the same message
    val asFile = java.nio.file.Files.createTempFile("snap-ref-file", "").toString
    val ex3 = intercept[IllegalArgumentException] {
      IndexMaintenance.exportSnapshot(spark, src, asFile)
    }
    assert(ex3.getMessage.contains("not empty"))
  }

  test("export fails fast on a source whose stored format version predates this build") {
    // plant a stale-format manifest: byte-identical files relabeled to
    // the current version would defeat every reader's version gate
    val src = tmp("snap-stale")
    SearchOps.writePostingsIndex(dayOne.toDF("doc_id", "text"), src)
    val f = java.nio.file.Paths.get(src, "_graft_manifest.json")
    val body = new String(java.nio.file.Files.readAllBytes(f), "UTF-8")
      .replace("\"format_version\": 2", "\"format_version\": 1")
    java.nio.file.Files.write(f, body.getBytes("UTF-8"))
    val ex = intercept[IllegalStateException] {
      IndexMaintenance.exportSnapshot(spark, src, tmp("snap-stale-out"))
    }
    assert(ex.getMessage.contains("format_version 1"),
      "the head-export path must version-gate like every reader")
  }

  test("export runs end to end through the Hadoop FileSystem API on file:// URIs") {
    val src = tmp("snap-hfs-src")
    SearchOps.writePostingsIndex(dayOne.toDF("doc_id", "text"), src)
    SearchOps.appendPostingsIndex(dayTwo.toDF("doc_id", "text"), src)
    val dst = tmp("snap-hfs-dst")
    // both roots handed over WITH the scheme: the listing, the per-file
    // executor copies, and the emptiness checks all resolve through
    // FileSystem — the path a cluster-backed store would take
    val st = IndexMaintenance.exportSnapshot(spark, s"file://$src", s"file://$dst")
    assert(st.family === "postings")
    assert(search(dst) === search(src),
      "the file://-schemed clone must serve byte-identically")
    // the scheme also reaches the refusal paths (same messages)
    val ex = intercept[IllegalArgumentException] {
      IndexMaintenance.exportSnapshot(spark, s"file://$src", s"file://$dst")
    }
    assert(ex.getMessage.contains("not empty"))
  }

  test("malformed versioned directories are never resurrected into a clone") {
    import java.nio.file.{Files, Paths}
    val src = tmp("snap-orphan-src")
    SearchOps.writePostingsIndex(dayOne.toDF("doc_id", "text"), src)
    val expected = search(src) // before planting: the orphans poison even the
    // SOURCE's partition discovery (conflicting epoch= values) — exactly why
    // copying them into a release artifact would be a delayed read failure
    // crash-orphaned / corrupted names that CLAIM a version but don't
    // parse: unreachable by exact-path readers, so a clone must skip them
    // (the old un-versioned fallback copied them verbatim)
    Seq("postings/epoch=abc", "postings/epoch=3.tmp").foreach { d =>
      val dir = Paths.get(src, d)
      Files.createDirectories(dir)
      Files.write(dir.resolve("stale.bin"), Array[Byte](1, 2, 3))
    }
    val dst = tmp("snap-orphan-dst")
    IndexMaintenance.exportSnapshot(spark, src, dst)
    assert(search(dst) === expected,
      "committed data clones intact AND the clone stays readable")
    assert(!Files.exists(Paths.get(dst, "postings/epoch=abc")) &&
        !Files.exists(Paths.get(dst, "postings/epoch=3.tmp")),
      "orphaned staging bytes must not become part of a release artifact")
  }

  test("an export is born fsck-clean, even from a damaged source") {
    import java.nio.file.{Files, Paths}
    val src = tmp("snap-fclean-src")
    SearchOps.writePostingsIndex(dayOne.toDF("doc_id", "text"), src)  // epoch 0
    SearchOps.appendPostingsIndex(dayTwo.toDF("doc_id", "text"), src) // epoch 1
    // accrete everything fsck reports short of damage: a live pin
    // holding the pre-compaction window, an orphan stage, a stranded
    // manifest tmp, an unparseable versioned name
    IndexManifest.registerPin(src, "serve-fclean", 1L, IndexManifest.Postings)
    SearchOps.compactPostingsIndex(spark, src) // floor rises; 0/1 stay pinned
    Files.createDirectories(Paths.get(src, "postings", "epoch=9"))
    Files.createDirectories(Paths.get(src, "postings", "epoch=3.tmp"))
    Files.write(Paths.get(src, "._graft_manifest.4.tmp"),
      "{}".getBytes(java.nio.charset.StandardCharsets.UTF_8))
    assert(IndexMaintenance.fsck(spark, Seq("src" -> src))
        .select("finding").collect().map(_.getString(0)).sorted.toSeq ===
      Seq("malformed_dir", "orphan_stage", "stale_pinned", "stray_tmp"))
    // the release artifact: committed window only - no litter, no
    // superseded epochs, no pins (a clone's retention is its own)
    val dst = tmp("snap-fclean-dst")
    IndexMaintenance.exportSnapshot(spark, src, dst)
    assert(IndexMaintenance.fsck(spark, Seq("dst" -> dst))
        .select("finding", "severity").collect()
        .map(r => (r.getString(0), r.getString(1))).toSeq === Seq(("ok", "ok")),
      "an export must be born fsck-clean")
    assert(IndexManifest.pins(dst).isEmpty,
      "the source's pin ledger must not travel into the clone")
  }
}
