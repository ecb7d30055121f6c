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

  // fully-qualified file:// URIs: every manifest/pin/ledger touch in
  // this suite goes through the Hadoop-FS control plane (LedgerIO),
  // proving an index root addressed by URI works end to end
  private def tmp(p: String) =
    "file://" + java.nio.file.Files.createTempDirectory(p).toString

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
    assert((pin.owner, pin.epoch, pin.floor) === (("serve-0", 1L, 0L)))
    assert(pin.registeredAtMs > 0L, "pins record their registration time")
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
    val live = IndexManifest.pins(dir)
    assert(live.map(p => (p.owner, p.epoch, p.floor)) === Seq(("run", 1L, 0L)))
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
    assert((again.owner, again.epoch, again.floor) === (("audit", 0L, 0L)))

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
    // dst-emptiness probe, both up front) precedes pin registration
    // and the distributed copy (the control plane itself is now
    // scheme-agnostic; an unreachable scheme still fails here first)
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
    assert(!LedgerIO.exists(LedgerIO.child(out, "_graft_pins")),
      "a clone must not inherit the SOURCE's live-reader registrations")
    assert(search(out) === search(dir))
  }

  test("pin owners with ':' round-trip the on-disk encoding (Hadoop Path rejects colons)") {
    val dir = tmp("pin-colon")
    SearchOps.writePostingsIndex(dayOne.toDF("doc_id", "text"), dir)
    val owner = "export:deadbeef01234567" // the export-pin owner shape
    IndexManifest.registerPin(dir, owner, 0L, IndexManifest.Postings)
    assert(IndexManifest.pins(dir).map(_.owner) === Seq(owner),
      "the ':'->'@' filename encoding must decode back to the registered owner")
    assert(IndexManifest.releasePin(dir, owner))
    assert(IndexManifest.pins(dir).isEmpty)
  }

  test("a leaked pin is visible (owner + age) and never auto-destroyed") {
    val dir = tmp("pin-leak")
    SearchOps.writePostingsIndex(dayOne.toDF("doc_id", "text"), dir)  // epoch 0
    SearchOps.appendPostingsIndex(dayTwo.toDF("doc_id", "text"), dir) // epoch 1
    // the "leak": an owner that pins and crashes without releasing
    IndexManifest.registerPin(dir, "crashed-job.42", 1L, IndexManifest.Postings)
    SearchOps.compactPostingsIndex(spark, dir)

    // the advisor NAMES the blocking pin and ages it — a leaked pin is
    // attributable, not indistinguishable from a live serve
    val adv = IndexMaintenance.advise(spark, Seq("leak" -> dir))
      .select("reason", "pin_owner", "pin_age_ms").first()
    assert(adv.getString(0) === "vacuum_blocked_by_pin")
    assert(adv.getString(1) === "crashed-job.42")
    assert(adv.getLong(2) >= 0L, "age must be computable from registered_at")

    // NOTHING reclaims it implicitly: vacuum skips, a too-young
    // janitor threshold skips, and both leave the pin alive
    assert(IndexManifest.vacuum(dir, IndexManifest.Postings) === 0L)
    assert(IndexManifest.releaseStalePins(dir, olderThanMs = 3600_000L).isEmpty,
      "a pin younger than the threshold is not stale")
    assert(IndexManifest.pins(dir).map(_.owner) === Seq("crashed-job.42"))

    // the EXPLICIT janitor with a crossed threshold releases exactly
    // the stale owner, and the next vacuum reclaims its window
    val released = IndexManifest.releaseStalePins(dir, olderThanMs = 0L,
      nowMs = System.currentTimeMillis() + 10_000L)
    assert(released.map(_.owner) === Seq("crashed-job.42"))
    assert(IndexManifest.pins(dir).isEmpty)
    assert(IndexManifest.vacuum(dir, IndexManifest.Postings) > 0L)
    // and on a healthy unpinned index the advisor columns stay inert
    val clean = IndexMaintenance.advise(spark, Seq("leak" -> dir))
      .select("pin_owner", "pin_age_ms").first()
    assert((clean.getString(0), clean.getLong(1)) === (("", -1L)))
  }
}
