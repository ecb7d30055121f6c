package graft.sources

import graft.SparkSpec
import graft.queries.VectorOps

/** The integrity surface: fsck must report exactly the damage planted
  * and nothing on a clean root, never repair anything, and run
  * unchanged against fully-qualified `file://` URI roots (the
  * Hadoop-FS control-plane path every finding's listing rides on).
  */
class FsckSpec extends SparkSpec {

  import spark.implicits._

  // fully-qualified file:// URIs: every listing in this suite goes
  // through the Hadoop-FS control plane (LedgerIO), proving fsck works
  // on an index root addressed by URI
  private def tmp(p: String) =
    "file://" + java.nio.file.Files.createTempDirectory(p).toString

  private def localOf(uri: String) = uri.stripPrefix("file://")

  // the corpus convention: 64-dim embeddings (VectorOps.dim)
  private val vecs = (0L until 5L).map { i =>
    i -> Array.tabulate(64)(j => if (j % 5 == i) 1.0f else -0.25f)
  }

  private def freshBq(uri: String): Unit =
    VectorOps.writeBqIndex(vecs.toDF("vec_id", "embedding"), uri)

  private def rows(named: (String, String)*): Seq[(String, String, String, String)] =
    IndexMaintenance.fsck(spark, named)
      .collect()
      .map(r => (r.getString(2), r.getString(3), r.getString(4), r.getString(1)))
      .sortBy(t => (t._1, t._3))

  test("a clean root is one ok row, and fsck repairs nothing") {
    val dir = tmp("fsck-ok")
    freshBq(dir)
    def walk(): Seq[String] = {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(java.nio.file.Paths.get(localOf(dir)))
        .iterator().asScala.map(_.toString).toVector.sorted
    }
    val before = walk()
    assert(rows("ok" -> dir) === Seq(("ok", "ok", "", "bq")))
    assert(walk() === before, "fsck is read-only: the tree must be untouched")
  }

  test("crash litter is reported: orphan stage, stray tmp, malformed dir") {
    val dir = tmp("fsck-litter")
    freshBq(dir)
    val local = localOf(dir)
    java.nio.file.Files.createDirectories(
      java.nio.file.Paths.get(local, "words", "epoch=9"))
    java.nio.file.Files.createDirectories(
      java.nio.file.Paths.get(local, "words", "epoch=2.tmp"))
    java.nio.file.Files.write(
      java.nio.file.Paths.get(local, "._graft_manifest.5.tmp"),
      "{}".getBytes(java.nio.charset.StandardCharsets.UTF_8))
    assert(rows("litter" -> dir) === Seq(
      ("malformed_dir", "info", "epoch=2.tmp", "bq"),
      ("orphan_stage", "info", "epochs=9", "bq"),
      ("stray_tmp", "info", "._graft_manifest.5.tmp", "bq")))
  }

  test("a live pin whose below-floor window was destroyed is an error; " +
      "an intact pinned window reports intentional retention") {
    val dir = tmp("fsck-pin")
    freshBq(dir)
    VectorOps.deleteFromBqIndex(Seq(0L).toDF("vec_id"), dir) // epoch 1
    IndexManifest.registerPin(dir, "replay-7", 1L, IndexManifest.Bq)
    VectorOps.compactBqIndex(spark, dir) // head 2, floor 2
    // intact: the superseded dirs survive under the pin - retention, not damage
    assert(rows("pinned" -> dir) === Seq(("stale_pinned", "info", "dirs=3", "bq")))
    // a NON-pin-aware tool destroys the protected window
    Seq("words" -> 0L, "dels" -> 0L, "dels" -> 1L).foreach { case (c, e) =>
      LedgerIO.deleteRecursive(LedgerIO.child(s"$dir/$c", s"epoch=$e"))
    }
    assert(rows("pinned" -> dir) === Seq(
      ("pin_window_missing", "error", "owner=replay-7 window=0-1", "bq")))
  }

  test("a pin above the committed head and an inverted pin are malformed") {
    val dir = tmp("fsck-pinhead")
    freshBq(dir)
    IndexManifest.registerPin(dir, "future", 0L, IndexManifest.Bq)
    // roll the manifest back underneath the pin (the damage scenario;
    // registerPin itself refuses unreadable epochs, so plant it directly)
    val pinFile = LedgerIO.child(s"$dir/_graft_pins", "future.pin")
    LedgerIO.writeAtomic(pinFile, ".future.pin.tmp",
      """{ "owner": "future", "epoch": 9, "floor": 0, "registered_at": 1 }""" + "\n")
    val inv = LedgerIO.child(s"$dir/_graft_pins", "inverted.pin")
    LedgerIO.writeAtomic(inv, ".inverted.pin.tmp",
      """{ "owner": "inverted", "epoch": 1, "floor": 5, "registered_at": 1 }""" + "\n")
    assert(rows("pins" -> dir) === Seq(
      ("pin_beyond_head", "warn", "owner=future epoch=9 head=0", "bq"),
      ("pin_inverted", "warn", "owner=inverted window=5-1", "bq")))
  }

  test("format skew and unknown family tags fail loud, not silent") {
    val stale = tmp("fsck-stale-fmt")
    freshBq(stale)
    IndexManifest.commit(stale, 0L, 0L, IndexManifest.Format("bq", 1))
    assert(rows("stale" -> stale) === Seq(
      ("format_mismatch", "error", "stored=1 expected=2", "bq")))
    val alien = tmp("fsck-alien")
    freshBq(alien)
    IndexManifest.commit(alien, 0L, 0L, IndexManifest.Format("zorp", 2))
    assert(rows("alien" -> alien) === Seq(
      ("unknown_family", "warn", "zorp", "zorp")))
  }

  test("an all-digit name past Long range is malformed litter, not a crash") {
    val dir = tmp("fsck-overflow")
    freshBq(dir)
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(
      localOf(dir), "words", "epoch=99999999999999999999"))
    assert(rows("overflow" -> dir) === Seq(
      ("malformed_dir", "info", "epoch=99999999999999999999", "bq")))
    assert(IndexManifest.vacuum(dir, IndexManifest.Bq) === 0L,
      "the janitor walks past unparseable litter instead of crashing")
  }

  test("a corrupted pin file is a loud error, not a silently released pin") {
    val dir = tmp("fsck-pincorrupt")
    freshBq(dir)
    IndexManifest.registerPin(dir, "serve-c", 0L, IndexManifest.Bq)
    // truncate the body in place: pins() must skip it (the lock-free
    // reader contract forbids throwing), fsck must NAME it - without
    // that, vacuum sees "no pin" and the protected window reads as
    // reclaimable garbage
    LedgerIO.writeAtomic(LedgerIO.child(s"$dir/_graft_pins", "serve-c.pin"),
      ".serve-c.pin.tmp", """{ "owner": "serve-c", "ep""")
    assert(IndexManifest.pins(dir).isEmpty,
      "pin consumers skip the unreadable file silently")
    assert(rows("corrupt" -> dir) === Seq(
      ("pin_unreadable", "error", "serve-c.pin", "bq")))
  }

  test("a crashed build reports no_manifest and nothing else") {
    val dir = tmp("fsck-none")
    assert(rows("crashed" -> dir) ===
      Seq(("no_manifest", "error", "", "_uncommitted")))
  }

  test("an overflow-corrupted manifest reads as no_manifest, not a fleet-aborting crash") {
    val dir = tmp("fsck-manifest-overflow")
    freshBq(dir)
    // foreign corruption: a number past Long range — field() must parse
    // it as absent (toLongOption), so the root degrades to no_manifest
    // and the REST of a fleet fsck still runs (report-never-crash)
    LedgerIO.writeAtomic(
      LedgerIO.child(dir, "_graft_manifest.json"), "._graft_manifest.json.tmp",
      """{ "format_version": 2, "epoch": 99999999999999999999, "base_epoch": 0, "family": "bq" }""" + "\n")
    assert(rows("corrupt" -> dir, "ok" -> { val d2 = tmp("fsck-mo-ok"); freshBq(d2); d2 }) ===
      Seq(("no_manifest", "error", "", "_uncommitted"), ("ok", "ok", "", "bq")))
  }

  test("a surviving gen= dir cannot vouch for a destroyed pinned epoch window") {
    val dir = tmp("fsck-genmask")
    freshBq(dir)
    VectorOps.deleteFromBqIndex(Seq(0L).toDF("vec_id"), dir) // epoch 1
    IndexManifest.registerPin(dir, "replay-g", 1L, IndexManifest.Bq)
    VectorOps.compactBqIndex(spark, dir) // head 2, floor 2
    Seq("words" -> 0L, "dels" -> 0L, "dels" -> 1L).foreach { case (c, e) =>
      LedgerIO.deleteRecursive(LedgerIO.child(s"$dir/$c", s"epoch=$e"))
    }
    // a centroid GENERATION dir whose value lands inside the pinned
    // window: a different number space — it must not mask the loss
    java.nio.file.Files.createDirectories(
      java.nio.file.Paths.get(localOf(dir), "cents", "gen=1"))
    assert(rows("genmask" -> dir) === Seq(
      ("pin_window_missing", "error", "owner=replay-g window=0-1", "bq"),
      ("stale_pinned", "info", "dirs=1", "bq")))
  }

  test("a rolled-back manifest does not shadow a destroyed pinned window") {
    val dir = tmp("fsck-shadow")
    freshBq(dir)
    IndexManifest.registerPin(dir, "replay", 0L, IndexManifest.Bq)
    // the pin claims epochs 0-9 while the manifest rolled back to head 1
    // with floor 1 — beyond-head AND window-missing must BOTH report
    LedgerIO.writeAtomic(LedgerIO.child(s"$dir/_graft_pins", "replay.pin"),
      ".replay.pin.tmp",
      """{ "owner": "replay", "epoch": 9, "floor": 0, "registered_at": 1 }""" + "\n")
    IndexManifest.commit(dir, 1L, 1L, IndexManifest.Bq)
    Seq("words", "dels").foreach { c =>
      LedgerIO.deleteRecursive(LedgerIO.child(s"$dir/$c", "epoch=0"))
    }
    assert(rows("shadow" -> dir) === Seq(
      ("pin_beyond_head", "warn", "owner=replay epoch=9 head=1", "bq"),
      ("pin_window_missing", "error", "owner=replay window=0-0", "bq")))
  }
}
