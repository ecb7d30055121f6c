package graft.operators

import scala.collection.mutable

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Cep.{FollowedMatch, Run}

/** Randomized differential test for [[Cep.FollowedScan]]'s index machinery
  * (per-step deques, tombstone draining, half-dead compaction, deadline
  * prefix-pop) against a ~30-line naive vector-scan oracle implementing the
  * documented relaxed-contiguity semantics directly.
  *
  * What must agree (channel timing is the one degree of freedom the index
  * is allowed — a frozen partial's Timeout may fire at tombstone-on-touch,
  * at the deadline prefix-pop, or at flush; its TUPLE never changes):
  *   - Main emissions per event, exactly (a completion fires at the
  *     completing event in both);
  *   - the per-event union invariant: live-runs ∪ timeouts-so-far is the
  *     same multiset of (firstTs, lastTs, matched) on both sides;
  *   - total Timeout emissions after flush, exactly.
  *
  * Inputs mimic the real call sites: within one reset→steps→snapshot fold
  * the timestamps are non-decreasing (both `followedByBatch`'s secondary
  * sort and `foldFollowed`'s per-batch sort guarantee that); a later fold
  * may regress in time (cross-batch lateness), carrying state through
  * snapshot/reset. Covers k = 2, 3, 8, 63 and windows small enough to make
  * expiry/compaction constant churn.
  */
class FollowedScanDiffSpec extends AnyFunSuite {

  private final class NaiveRun(val firstTs: Long, var lastTs: Long, var matched: Int)

  /** The documented semantics, scanned over a flat vector per event. */
  private final class NaiveScan(k: Int, windowSec: Long) {
    val runs = mutable.ArrayBuffer.empty[NaiveRun]
    val timeouts = mutable.ArrayBuffer.empty[FollowedMatch]

    def reset(rs: Vector[Run]): Unit = {
      runs.clear()
      rs.sortBy(_.firstTs).foreach(r => runs += new NaiveRun(r.firstTs, r.lastTs, r.matched))
    }

    def step(kid: Long, t: Long, m: Long): Vector[FollowedMatch] = {
      // timer-first, at-deadline: every at/over-deadline run times out
      // eagerly (per-key event time has reached its deadline; the strict
      // completion guard means it could never have advanced at this t)
      val (dead, live) = runs.partition(r => r.firstTs + windowSec <= t)
      dead.foreach(r => timeouts += FollowedMatch(kid, r.firstTs, r.lastTs, r.matched))
      runs.clear(); runs ++= live
      val mains = Vector.newBuilder[FollowedMatch]
      // highest step first so one event never advances a run twice
      var i = k - 1
      while (i >= 1) {
        if ((m & (1L << i)) != 0) {
          val done = mutable.ArrayBuffer.empty[NaiveRun]
          runs.foreach { r =>
            // advance only on the earliest LATER event: a cross-batch late
            // event older than the run's progress point leaves it inert
            if (r.matched == i && t - r.firstTs < windowSec && t >= r.lastTs) {
              if (i + 1 == k) { mains += FollowedMatch(kid, r.firstTs, t, k); done += r }
              else { r.matched = i + 1; r.lastTs = t }
            }
          }
          runs --= done
        }
        i -= 1
      }
      if ((m & 1L) != 0) {
        if (k == 1) mains += FollowedMatch(kid, t, t, 1)
        else runs += new NaiveRun(t, t, 1)
      }
      mains.result()
    }

    def snapshotTuples: Vector[(Long, Long, Int)] =
      runs.map(r => (r.firstTs, r.lastTs, r.matched)).toVector

    def flush(kid: Long): Unit = {
      runs.foreach(r => timeouts += FollowedMatch(kid, r.firstTs, r.lastTs, r.matched))
      runs.clear()
    }
  }

  private def tuples(ms: Iterable[FollowedMatch]): Vector[(Long, Long, Int)] =
    ms.map(m => (m.firstTs, m.lastTs, m.matched)).toVector

  /** Drive both scans over chunked (per-chunk-sorted) events with
    * snapshot/reset between chunks, asserting the three contracts.
    */
  private def differential(
      k: Int,
      windowSec: Long,
      chunks: Seq[Seq[(Long, Long)]], // (ts, mask), each chunk sorted by ts
      label: String,
  ): Unit = {
    val kid = 7L
    val naive = new NaiveScan(k, windowSec)
    var state = Vector.empty[Run]
    var naiveState = Vector.empty[Run]
    val gotTimeouts = mutable.ArrayBuffer.empty[FollowedMatch]
    var scan: Cep.FollowedScan = null
    chunks.foreach { chunk =>
      scan = new Cep.FollowedScan(k, windowSec)
      scan.reset(state)
      naive.reset(naiveState)
      chunk.foreach { case (t, m) =>
        val out = scan.step(kid, t, m)
        val gotMains = tuples(out.filter(_.channel == Out.Main).map(_.value))
        gotTimeouts ++= out.filter(_.channel == Out.Timeout).map(_.value)
        val wantMains = tuples(naive.step(kid, t, m))
        assert(gotMains.sorted === wantMains.sorted, s"$label: Main emissions diverge at t=$t")
        // union invariant: every opened run is live on exactly one side of
        // (snapshot, timeouts) with an identical frozen tuple
        val gotUnion =
          (scan.snapshot.map(r => (r.firstTs, r.lastTs, r.matched)) ++ tuples(gotTimeouts)).sorted
        val wantUnion = (naive.snapshotTuples ++ tuples(naive.timeouts)).sorted
        assert(gotUnion === wantUnion, s"$label: live∪timeout multiset diverges at t=$t")
      }
      state = scan.snapshot
      naiveState = naive.snapshotTuples.map { case (f, l, m) => Run(f, l, m) }
    }
    gotTimeouts ++= scan.flush(kid).map(_.value)
    naive.flush(kid)
    assert(tuples(gotTimeouts).sorted === tuples(naive.timeouts).sorted,
      s"$label: total Timeout emissions diverge")
  }

  private def randomChunks(
      rnd: scala.util.Random,
      k: Int,
      n: Int,
      maxStepGap: Int,
      lateJumpBack: Int,
      nChunks: Int,
      pOpen: Double,
      pBit: Double,
  ): Seq[Seq[(Long, Long)]] = {
    var t = 1000L
    val all = Vector.tabulate(nChunks) { c =>
      if (c > 0) t = math.max(0L, t - rnd.nextInt(lateJumpBack + 1)) // cross-batch lateness
      Vector.fill(n / nChunks) {
        t += rnd.nextInt(maxStepGap + 1)
        var m = 0L
        if (rnd.nextDouble() < pOpen) m |= 1L
        var i = 1
        while (i < k) { if (rnd.nextDouble() < pBit) m |= (1L << i); i += 1 }
        (t, m)
      }.sortBy(_._1)
    }
    all
  }

  test("differential: random masks across k=2,3,8 with heavy expiry churn") {
    val rnd = new scala.util.Random(42)
    for (k <- Seq(2, 3, 8); window <- Seq(5L, 40L); trial <- 1 to 3) {
      val chunks = randomChunks(rnd, k, n = 2000, maxStepGap = 3, lateJumpBack = 60,
        nChunks = 4, pOpen = 0.5, pBit = 0.35)
      differential(k, window, chunks, s"k=$k w=$window trial=$trial")
    }
  }

  test("differential: k=63 wide-mask patterns (full Long mask range)") {
    val rnd = new scala.util.Random(63)
    // dense masks so runs actually climb the 63 steps inside the window
    val chunks = randomChunks(rnd, k = 63, n = 1500, maxStepGap = 1, lateJumpBack = 30,
      nChunks = 3, pOpen = 0.4, pBit = 0.9)
    differential(63, windowSec = 120L, chunks, "k=63")
  }

  test("differential: adversarial all-step-0 bot key (opens only, constant expiry)") {
    val rnd = new scala.util.Random(7)
    var t = 0L
    val chunk = Vector.fill(5000) { t += rnd.nextInt(2) + 1; (t, 1L) }
    differential(3, windowSec = 10L, Seq(chunk), "bot-key")
  }

  test("differential: same-timestamp floods exercise tie handling and compaction") {
    val rnd = new scala.util.Random(11)
    var t = 0L
    val chunk = Vector.fill(3000) {
      if (rnd.nextDouble() < 0.1) t += 12 // hop past the window: mass expiry
      (t, rnd.nextLong() & 0x7L)
    }.sortBy(_._1)
    differential(3, windowSec = 10L, Seq(chunk), "flood")
  }

  test("reset refuses carried runs for k=1 (byStep has no step-1 deque)") {
    val scan = new Cep.FollowedScan(1, 10L)
    scan.reset(Vector.empty) // fine
    intercept[IllegalArgumentException] {
      scan.reset(Vector(Run(0L, 0L, 1)))
    }
  }

  test("chunked snapshot/reset round-trip is emission-identical to one shot") {
    val rnd = new scala.util.Random(99)
    val chunks = randomChunks(rnd, k = 3, n = 1200, maxStepGap = 2, lateJumpBack = 0,
      nChunks = 6, pOpen = 0.5, pBit = 0.4)
    val flat = chunks.flatten
    val kid = 1L

    def runAll(cs: Seq[Seq[(Long, Long)]]): Vector[(String, (Long, Long, Int))] = {
      var state = Vector.empty[Run]
      val out = mutable.ArrayBuffer.empty[(String, (Long, Long, Int))]
      var scan: Cep.FollowedScan = null
      cs.foreach { c =>
        scan = new Cep.FollowedScan(3, 15L)
        scan.reset(state)
        c.foreach { case (t, m) =>
          scan.step(kid, t, m).foreach(o =>
            out += ((o.channel, (o.value.firstTs, o.value.lastTs, o.value.matched))))
        }
        state = scan.snapshot
      }
      scan.flush(kid).foreach(o =>
        out += ((o.channel, (o.value.firstTs, o.value.lastTs, o.value.matched))))
      out.toVector
    }

    assert(runAll(chunks).sorted === runAll(Seq(flat)).sorted)
  }
}
