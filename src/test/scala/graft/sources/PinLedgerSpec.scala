package graft.sources

import graft.SparkSpec
import graft.queries.SearchOps

/** The pin ledger: a registered as-of pin must keep its epoch replayable
  * through compaction + vacuum (the janitor skips the pinned window),
  * the advisor must report the block instead of advising destruction,
  * and releasing must hand the epochs back to the next vacuum. Exports
  * hold an in-flight pin so the copy can never race the janitor.
  */
class PinLedgerSpec extends SparkSpec {

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

  test("a pinned epoch survives compact + vacuum and reads identically; release reclaims") {
    val dir = tmp("pin-src")
    SearchOps.writePostingsIndex(dayOne.toDF("doc_id", "text"), dir)  // epoch 0
    SearchOps.appendPostingsIndex(dayTwo.toDF("doc_id", "text"), dir) // epoch 1
    val pinnedView = search(dir, asOf = Some(0L))

    // the standing as-of consumer registers BEFORE the maintenance runs;
    // pinning the head (epoch 1, floor 0) protects the whole window, so
    // any as-of WITHIN it — including 0 — stays replayable
    val pin = IndexManifest.registerPin(dir, "serve-0", 1L, IndexManifest.Postings)
    assert(pin === IndexManifest.Pin("serve-0", 1L, 0L))
    SearchOps.compactPostingsIndex(spark, dir)

    // the advisor names the pin instead of advising destruction
    val adv = IndexMaintenance.advise(spark, Seq("pinned" -> dir))
      .select("action", "reason").first()
    assert((adv.getString(0), adv.getString(1)) === ("ok", "vacuum_blocked_by_pin"))

    // the janitor SKIPS the pinned window — and the pinned read still
    // resolves even though epoch 0 is now below the committed floor
    assert(IndexManifest.vacuum(dir, IndexManifest.Postings) === 0L)
    assert(search(dir, asOf = Some(0L)) === pinnedView,
      "a pinned serve must survive a concurrent vacuum attempt")

    // release hands the epochs back: vacuum reclaims, the as-of refuses
    assert(IndexManifest.releasePin(dir, "serve-0"))
    assert(!IndexManifest.releasePin(dir, "serve-0"), "idempotent release")
    assert(IndexManifest.vacuum(dir, IndexManifest.Postings) > 0L)
    val refused = intercept[IllegalArgumentException] { search(dir, asOf = Some(0L)) }
    assert(refused.getMessage.contains("registerPin BEFORE the compaction"))
  }

  test("vacuum reclaims superseded epochs OUTSIDE the pinned window") {
    val dir = tmp("pin-part")
    SearchOps.writePostingsIndex(dayOne.toDF("doc_id", "text"), dir)  // epoch 0
    SearchOps.appendPostingsIndex(dayTwo.toDF("doc_id", "text"), dir) // epoch 1
    val pinnedView = search(dir, asOf = Some(0L))
    IndexManifest.registerPin(dir, "rel-0", 0L, IndexManifest.Postings)
    SearchOps.compactPostingsIndex(spark, dir) // head 2, floor 2

    // epoch-1 garbage sits ABOVE the pin's [0, 0] window: reclaimable —
    // the pin protects its snapshot, it does not starve the janitor
    val adv = IndexMaintenance.advise(spark, Seq("part" -> dir))
      .select("action", "reason").first()
    assert((adv.getString(0), adv.getString(1)) === ("vacuum", "stale_epochs"))
    assert(IndexManifest.vacuum(dir, IndexManifest.Postings) > 0L)
    assert(search(dir, asOf = Some(0L)) === pinnedView,
      "partial reclaim must leave the pinned snapshot fully readable")
    assert(IndexManifest.vacuum(dir, IndexManifest.Postings) === 0L,
      "second pass: nothing unpinned left to reclaim")
  }

  test("pins register only inside the committed window, with filename-safe owners") {
    val dir = tmp("pin-bounds")
    SearchOps.writePostingsIndex(dayOne.toDF("doc_id", "text"), dir)
    val exHigh = intercept[IllegalArgumentException] {
      IndexManifest.registerPin(dir, "x", 7L, IndexManifest.Postings)
    }
    assert(exHigh.getMessage.contains("outside the committed window"))
    intercept[IllegalArgumentException] {
      IndexManifest.registerPin(dir, "../escape", 0L, IndexManifest.Postings)
    }
    // re-pinning the same owner overwrites (one file per owner)
    SearchOps.appendPostingsIndex(dayTwo.toDF("doc_id", "text"), dir)
    IndexManifest.registerPin(dir, "run", 0L, IndexManifest.Postings)
    IndexManifest.registerPin(dir, "run", 1L, IndexManifest.Postings)
    assert(IndexManifest.pins(dir) === Seq(IndexManifest.Pin("run", 1L, 0L)))
  }

  test("a pinned below-floor epoch can take NEW pins and be exported (the release workflow)") {
    val dir = tmp("pin-repin")
    SearchOps.writePostingsIndex(dayOne.toDF("doc_id", "text"), dir)  // epoch 0
    SearchOps.appendPostingsIndex(dayTwo.toDF("doc_id", "text"), dir) // epoch 1
    val pinnedView = search(dir, asOf = Some(0L))
    IndexManifest.registerPin(dir, "serve", 0L, IndexManifest.Postings)
    SearchOps.compactPostingsIndex(spark, dir) // floor now 2: epoch 0 lives on the pin alone

    // a SECOND consumer pins the same below-floor epoch through the
    // first pin's protection — and records the COVERING pin's floor,
    // not the current one
    val again = IndexManifest.registerPin(dir, "audit", 0L, IndexManifest.Postings)
    assert(again === IndexManifest.Pin("audit", 0L, 0L))

    // the workflow the pin ledger exists for: make the pinned snapshot
    // a durable release artifact WHILE it only exists via the pin
    val dst = tmp("pin-repin-out")
    val st = IndexMaintenance.exportSnapshot(spark, dir, dst, asOf = Some(0L))
    assert(st.epoch === 0L)
    assert(search(dst) === pinnedView,
      "the clone of a pin-protected below-floor epoch serves the pinned view")
    // first consumer releases: the janitor reclaims the epoch-1 dirs
    // (outside audit's [0, 0] window) but the pinned epoch 0 survives
    IndexManifest.releasePin(dir, "serve")
    assert(IndexManifest.vacuum(dir, IndexManifest.Postings) > 0L)
    assert(search(dir, asOf = Some(0L)) === pinnedView,
      "the second pin still protects the window it covers")
    IndexManifest.releasePin(dir, "audit")
    assert(IndexManifest.vacuum(dir, IndexManifest.Postings) > 0L)
    val refused = intercept[IllegalArgumentException] { search(dir, asOf = Some(0L)) }
    assert(refused.getMessage.contains("registerPin BEFORE the compaction"))
    assert(search(dst) === pinnedView, "the release artifact outlives everything")
  }

  test("a non-file destination fails BEFORE any byte moves or pin registers") {
    // this sandbox has no reachable non-file FileSystem, so the reject
    // comes from FS resolution (UnknownHost) — the point under test is
    // the ORDERING: destination validation (qualifiedRoot + the
    // file-scheme control-plane gate, both up front since the review)
    // precedes pin registration and the distributed copy
    val dir = tmp("pin-scheme")
    SearchOps.writePostingsIndex(dayOne.toDF("doc_id", "text"), dir)
    intercept[Exception] {
      IndexMaintenance.exportSnapshot(spark, dir, "hdfs://nowhere:1/release")
    }
    assert(IndexManifest.pins(dir).isEmpty,
      "destination validation fires before the in-flight pin is even registered")
  }

  test("export holds an in-flight pin and always releases it") {
    val dir = tmp("pin-exp")
    SearchOps.writePostingsIndex(dayOne.toDF("doc_id", "text"), dir)
    IndexMaintenance.exportSnapshot(spark, dir, tmp("pin-exp-out"))
    assert(IndexManifest.pins(dir).isEmpty,
      "a successful export must not leak its in-flight pin")
    // a failed copy releases too: poison the destination AFTER the
    // emptiness check by nesting it inside a file path (mkdirs fails)
    val asFile = java.nio.file.Files.createTempFile("pin-exp-file", "").toString
    intercept[Exception] {
      IndexMaintenance.exportSnapshot(spark, dir, s"$asFile/nested/out")
    }
    assert(IndexManifest.pins(dir).isEmpty,
      "a failed export must not leak its in-flight pin")
  }

  test("the pin ledger never appears as a component or in an export") {
    val dir = tmp("pin-ghost")
    SearchOps.writePostingsIndex(dayOne.toDF("doc_id", "text"), dir)
    IndexManifest.registerPin(dir, "standing", 0L, IndexManifest.Postings)
    val comps = IndexManifest.describe(spark, Seq("g" -> dir))
      .select("components").first().getString(0)
    assert(!comps.contains("_graft_pins"), s"protocol state leaked: $comps")
    val out = tmp("pin-ghost-out")
    IndexMaintenance.exportSnapshot(spark, dir, out)
    assert(!java.nio.file.Files.exists(
        java.nio.file.Paths.get(out, "_graft_pins")),
      "a clone must not inherit the SOURCE's live-reader registrations")
    assert(search(out) === search(dir))
  }
}
