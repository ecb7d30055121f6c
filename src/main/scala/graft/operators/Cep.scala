package graft.operators

import org.apache.spark.sql.{Dataset, Encoder, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Generic sequence CEP — the engine-shaped pattern API covering the
  * three Flink CEP families the reference hard-codes per job:
  *
  *   - STRICT contiguity, `begin.next.….next.within(w)`
  *     ([[strictBatch]]/[[strictStreaming]]; LoginFailWithCep.java:52-69
  *     is the k=2 case, generalized to arbitrary k);
  *   - RELAXED contiguity with a timeout side channel,
  *     `begin.followedBy.….within(w)` + OutputTag
  *     ([[followedByBatch]]/[[followedByStreaming]];
  *     OrderPayTimeOut.java:56-70 is the k=2 case — CepSpec proves
  *     channel parity with [[OrderPayDetector]] on its expressible
  *     subset);
  *   - relaxed ALL-MATCHES counting, when the contract is completion
  *     counts rather than match lists ([[graft.operators.Funnel]] — the
  *     within-key-scalable form).
  *
  * The dedicated detectors remain the reference-faithful jobs (extra
  * outcomes like pay-without-create); these operators are the reusable
  * surface a CEP user programs against.
  *
  * Semantics: a match is k CONSECUTIVE events of one key (strict
  * contiguity — an intervening event of the same key breaks the run) in
  * per-key event-time order (ties broken by the caller's `tieBreak`)
  * where event i satisfies `steps(i)` and `last.ts - first.ts <=
  * windowSec`. Every position is tested, so overlapping matches all emit
  * (Flink's default no-skip after-match strategy).
  *
  * Scale: both batch paths stage through [[maskedSorted]] — repartition
  * on the key + spillable in-partition sort + a streaming boundary scan —
  * so no task ever holds a key's event history (shuffle keyed like
  * Flink's keyBy, memory bounded by the scan state); the streaming path
  * keeps the last k-1 events per key — O(k) state — TTL'd with an
  * event-time timeout `windowSec` past the newest buffered event, since
  * any later event completing a pattern with an older prefix would
  * exceed the window anyway. Same cross-batch out-of-order caveat as
  * [[LoginFailDetector.eagerStreaming]]: events are folded in event-time
  * order within a micro-batch; an event arriving in a later batch than a
  * younger neighbour is matched in arrival order (the reference's
  * ascending-watermark assumption).
  */
object Cep {

  final case class SeqMatch(key: Long, firstTs: Long, lastTs: Long)

  /** A completed or timed-out relaxed match: `matched` = steps satisfied
    * (k for Main-channel completions, < k for Timeout-channel partials).
    */
  final case class FollowedMatch(key: Long, firstTs: Long, lastTs: Long, matched: Int)

  /** One in-flight relaxed partial match. */
  final case class Run(firstTs: Long, lastTs: Long, matched: Int)

  /** Serializable streaming state: the active runs of one key. */
  final case class FollowedState(runs: Seq[Run])

  private def slideMatches[E](
      kid: Long,
      sorted: Seq[E],
      ts: E => Long,
      steps: Seq[E => Boolean],
      windowSec: Long,
  ): Iterator[SeqMatch] = {
    val k = steps.length
    sorted.iterator.sliding(k).withPartial(false).flatMap { w =>
      val ok = w.lazyZip(steps).forall((e, p) => p(e)) &&
        ts(w.last) - ts(w.head) <= windowSec
      if (ok) Iterator.single(SeqMatch(kid, ts(w.head), ts(w.last))) else Iterator.empty
    }
  }

  /** Secondary-sort staging shared by the batch scans: one slim
    * (key, ts, tieBreak, stepMask) row per event — mask bit i set when
    * `steps(i)` matches — repartitioned on the key and sorted within
    * partitions. Predicates evaluate ONCE per event here; the downstream
    * scan is a pure streaming pass with key-boundary detection, so no
    * task ever materializes a key's event list (the sort itself is
    * Spark's spillable external sorter).
    */
  private def maskedSorted[E](
      events: Dataset[E],
      key: E => Long,
      ts: E => Long,
      tieBreak: E => Long,
      steps: Seq[E => Boolean],
  ): Dataset[(Long, Long, Long, Long)] = {
    require(steps.nonEmpty, "pattern needs at least one step")
    require(steps.length <= 63, "pattern mask is a Long: at most 63 steps")
    implicit val enc = org.apache.spark.sql.catalyst.encoders
      .ExpressionEncoder[(Long, Long, Long, Long)]()
    import org.apache.spark.sql.functions.col
    events
      .map { e =>
        var m = 0L
        var i = 0
        while (i < steps.length) { if (steps(i)(e)) m |= (1L << i); i += 1 }
        (key(e), ts(e), tieBreak(e), m)
      }
      .repartition(col("_1"))
      .sortWithinPartitions(col("_1"), col("_2"), col("_3"))
  }

  /** Batch: per-key time-ordered scan of every k-window (secondary sort;
    * per-key memory is the k-event ring buffer alone).
    */
  def strictBatch[E](
      events: Dataset[E],
      key: E => Long,
      ts: E => Long,
      tieBreak: E => Long,
      steps: Seq[E => Boolean],
      windowSec: Long,
  ): Dataset[SeqMatch] = {
    implicit val enc = Encoders.product[SeqMatch]
    val k = steps.length
    maskedSorted(events, key, ts, tieBreak, steps).mapPartitions { it =>
      var cur = 0L
      var started = false
      val buf = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)] // (ts, mask)
      it.flatMap { case (kkey, t, _, m) =>
        if (!started || kkey != cur) { cur = kkey; started = true; buf.clear() }
        buf += ((t, m))
        if (buf.length > k) buf.remove(0)
        val ok = buf.length == k && t - buf(0)._1 <= windowSec && {
          var i = 0
          var all = true
          while (all && i < k) { all = (buf(i)._2 & (1L << i)) != 0; i += 1 }
          all
        }
        if (ok) Iterator.single(SeqMatch(cur, buf(0)._1, t)) else Iterator.empty
      }
    }
  }

  // ------------------------------------------------------------------
  // Relaxed contiguity (`begin.followedBy.….followedBy.within(window)`)
  // with a timeout side channel — the Flink CEP family OrderPayTimeOut
  // .java:56-70 uses (create followedBy pay within 15min, timed-out
  // partials to an OutputTag). Semantics, per key in (ts, tieBreak)
  // order:
  //   - every event matching steps(0) OPENS a run;
  //   - a run at step i advances on the earliest later event satisfying
  //     steps(i) (intervening non-matching events are skipped — relaxed
  //     contiguity); runs may share events but do not branch per event
  //     (greedy-first, the deterministic subset of Flink's all-matches
  //     expansion — the all-matches COUNT is [[graft.operators.Funnel]]);
  //   - completion requires last.ts - first.ts < windowSec STRICTLY
  //     (the deadline-timer view: an event AT first+window has already
  //     missed the deadline — matches OrderPayDetector's timer);
  //   - a run whose deadline passes (per-key event time, then the real
  //     watermark in streaming, then end-of-input in batch) emits its
  //     partial on the Timeout channel.
  // The dedicated detectors remain the reference-faithful jobs (the
  // order detector adds the pay-without-create outcomes CEP cannot see);
  // CepSpec proves channel-level parity on the expressible subset.
  // ------------------------------------------------------------------

  /** One in-flight relaxed partial match, as the scan tracks it. A run
    * completed or expired in place is tombstoned (`dead`) and dropped
    * lazily by whichever index sees it next.
    */
  private final class RunM(val firstTs: Long, var lastTs: Long, var matched: Int) {
    var dead: Boolean = false
    var ooo: Boolean = false // opened out of byOpen order (cross-batch late open)
  }

  /** Shared relaxed-contiguity fold over (ts, stepMask) pairs of ONE key:
    * expire (timer-first, strict <), advance, open. Mutable so the batch
    * boundary scan streams events through it one at a time.
    *
    * Runs are indexed two ways so a hot key costs O(1) + O(emissions)
    * per event rather than an O(open-runs) scan (the Flink-NFA property:
    * an event only touches states with a matching transition,
    * OP/process/OrderPayTimeOut.java:56-70 never rescans inert state):
    *
    *   - `byStep(i)` holds the runs waiting on step i, so an event with
    *     mask m touches only the deques named by m's bits — a bot key
    *     emitting only step-0 events opens runs but never rescans them;
    *   - `byOpen` holds every run in open order. Opens arrive in event-
    *     time order and the window is constant, so open order IS
    *     deadline order and expiry pops from the front. `reset` sorts
    *     restored state by `firstTs`, so the invariant survives resets;
    *     the only way it breaks is a cross-batch LATE open inside one
    *     streaming fold (an event older than a restored run). Such a
    *     run is flagged `ooo`, and while any live `ooo` run exists the
    *     expiry phase falls back to a full byOpen sweep, so per-key
    *     event-time timers stay EAGER even through broken order — a
    *     late-expired run can never be resurrected into a Main by a
    *     still-later late event after a snapshot/reset round-trip. The
    *     sweep costs O(open-runs) per event only while a live late open
    *     exists (bounded by that run's window).
    *
    * Heap = open-runs + not-yet-popped tombstones, both bounded by
    * opens-within-window; a byStep deque that turns half-dead (expired
    * runs whose step never fired) is compacted, keeping the lazy
    * deletion amortized O(1) per death.
    */
  private[operators] final class FollowedScan(k: Int, windowSec: Long) {
    private val byStep = Array.fill(k)(new java.util.ArrayDeque[RunM]()) // index 0 unused
    private val byOpen = new java.util.ArrayDeque[RunM]()
    private val deadIn = new Array[Int](k)
    private var lastOpenTs = Long.MinValue // max firstTs appended to byOpen
    private var disorder = 0 // live runs opened out of byOpen order

    /** Tombstone a run, keeping the disorder count exact. */
    private def kill(r: RunM): Unit = {
      r.dead = true
      if (r.ooo) { r.ooo = false; disorder -= 1 }
    }

    def reset(runs0: Vector[Run]): Unit = {
      // k == 1 never creates runs (step() completes immediately), and
      // byStep has no index 1 to file them under — enforce locally
      require(runs0.isEmpty || k > 1, s"k=$k pattern cannot carry open runs")
      byOpen.clear()
      var i = 1
      while (i < k) { byStep(i).clear(); deadIn(i) = 0; i += 1 }
      // restored streaming state can be out of open order (cross-batch
      // late opens were appended); sort so open order = deadline order
      lastOpenTs = Long.MinValue
      disorder = 0
      runs0.sortBy(_.firstTs).foreach { r =>
        val n = new RunM(r.firstTs, r.lastTs, r.matched)
        byOpen.addLast(n)
        byStep(n.matched).addLast(n)
        lastOpenTs = n.firstTs
      }
    }

    /** Live runs in open (firstTs) order — the streaming state snapshot. */
    def snapshot: Vector[Run] = {
      val b = Vector.newBuilder[Run]
      byOpen.forEach(n => if (!n.dead) b += Run(n.firstTs, n.lastTs, n.matched))
      b.result()
    }

    private def compact(i: Int): Unit =
      if (i > 0 && deadIn(i) * 2 > byStep(i).size) {
        val d = byStep(i)
        var n = d.size
        while (n > 0) {
          val r = d.pollFirst()
          if (!r.dead) d.addLast(r)
          n -= 1
        }
        deadIn(i) = 0
      }

    /** One (ts, stepMask) event of the current key → emissions. */
    def step(kid: Long, t: Long, m: Long): Vector[Out[FollowedMatch]] = {
      val out = Vector.newBuilder[Out[FollowedMatch]]
      // 1. fire deadline timers at/below this event's time (the timer
      //    fires AT the deadline: an event at first+window has already
      //    missed it, so such a run is frozen — expiring it now keeps
      //    per-key event time eager and leaves nothing for a late event
      //    to resurrect). The expired runs are exactly byOpen's
      //    over-deadline prefix — unless a live out-of-order open exists,
      //    in which case sweep the whole index (see class doc).
      var front = byOpen.peekFirst()
      while (front != null && (front.dead || front.firstTs + windowSec <= t)) {
        byOpen.pollFirst()
        if (!front.dead) {
          out += Out(Out.Timeout, FollowedMatch(kid, front.firstTs, front.lastTs, front.matched))
          kill(front)
          deadIn(front.matched) += 1
          compact(front.matched)
        }
        front = byOpen.peekFirst()
      }
      if (disorder > 0) byOpen.forEach { r =>
        if (!r.dead && r.firstTs + windowSec <= t) {
          out += Out(Out.Timeout, FollowedMatch(kid, r.firstTs, r.lastTs, r.matched))
          kill(r)
          deadIn(r.matched) += 1
          compact(r.matched)
        }
      }
      // 2. advance every run whose next step this event satisfies — only
      //    the deques named by the mask are touched; highest step first
      //    so a run advanced by this event is not advanced twice by it
      var i = k - 1
      while (i >= 1) {
        if ((m & (1L << i)) != 0) {
          val d = byStep(i)
          var n = d.size
          while (n > 0) {
            val r = d.pollFirst()
            n -= 1
            if (!r.dead) {
              if (t - r.firstTs >= windowSec) {
                // unreachable: phase 1's at-deadline expiry already killed
                // every such run — kept as a frozen-partial safety net
                out += Out(Out.Timeout, FollowedMatch(kid, r.firstTs, r.lastTs, r.matched))
                kill(r) // byOpen drops the tombstone when it reaches the front
              } else if (t < r.lastTs) {
                // cross-batch late event older than the run's progress
                // point: a run advances only on the earliest LATER event
                d.addLast(r)
              } else if (i + 1 == k) {
                out += Out(Out.Main, FollowedMatch(kid, r.firstTs, t, k))
                kill(r) // byOpen drops the tombstone when it reaches the front
              } else {
                r.matched = i + 1
                r.lastTs = t
                byStep(i + 1).addLast(r)
              }
            }
          }
          deadIn(i) = 0 // drained; every survivor re-added is live
        }
        i -= 1
      }
      // 3. open a new run (after advancing — an event never advances the
      // run it opens: advancement requires a strictly later event)
      if ((m & 1L) != 0) {
        if (k == 1) out += Out(Out.Main, FollowedMatch(kid, t, t, 1))
        else {
          val n = new RunM(t, t, 1)
          if (t < lastOpenTs) { n.ooo = true; disorder += 1 }
          else lastOpenTs = t
          byOpen.addLast(n)
          byStep(1).addLast(n)
        }
      }
      out.result()
    }

    /** End of input (batch) — watermark → ∞: every partial times out. */
    def flush(kid: Long): Vector[Out[FollowedMatch]] = {
      val out = Vector.newBuilder[Out[FollowedMatch]]
      byOpen.forEach(n =>
        if (!n.dead) out += Out(Out.Timeout, FollowedMatch(kid, n.firstTs, n.lastTs, n.matched)))
      byOpen.clear()
      var i = 1
      while (i < k) { byStep(i).clear(); deadIn(i) = 0; i += 1 }
      lastOpenTs = Long.MinValue
      disorder = 0
      out.result()
    }
  }

  /** Per-key fold for the streaming path (micro-batch-bounded input). */
  private def foldFollowed[E](
      kid: Long,
      runs0: Vector[Run],
      sorted: Seq[E],
      ts: E => Long,
      steps: Seq[E => Boolean],
      windowSec: Long,
  ): (Vector[Run], Vector[Out[FollowedMatch]]) = {
    val scan = new FollowedScan(steps.length, windowSec)
    scan.reset(runs0)
    val out = Vector.newBuilder[Out[FollowedMatch]]
    sorted.foreach { e =>
      var m = 0L
      var i = 0
      while (i < steps.length) { if (steps(i)(e)) m |= (1L << i); i += 1 }
      out ++= scan.step(kid, ts(e), m)
    }
    (scan.snapshot, out.result())
  }

  /** Batch: end of input is watermark → ∞, so every surviving partial
    * times out. Same secondary-sort staging as [[strictBatch]]: the fold
    * consumes (ts, stepMask) pairs off the spillable in-partition sort
    * with key-boundary detection, so no task ever materializes a key's
    * event history — per-key heap is the open-runs index alone, and the
    * per-event CPU is O(1) + O(emissions) via [[FollowedScan]]'s
    * step/deadline indexing (a bot key with 10^8 all-step-0 events costs
    * sort spill, not executor heap or a quadratic rescan).
    */
  def followedByBatch[E](
      events: Dataset[E],
      key: E => Long,
      ts: E => Long,
      tieBreak: E => Long,
      steps: Seq[E => Boolean],
      windowSec: Long,
  ): Dataset[Out[FollowedMatch]] = {
    implicit val enc = Encoders.product[Out[FollowedMatch]]
    val k = steps.length
    maskedSorted(events, key, ts, tieBreak, steps).mapPartitions { it =>
      var cur = 0L
      var started = false
      val scan = new FollowedScan(k, windowSec)
      it.flatMap { case (kkey, t, _, m) =>
        val boundary =
          if (started && kkey != cur) scan.flush(cur) else Vector.empty[Out[FollowedMatch]]
        if (!started || kkey != cur) { cur = kkey; started = true }
        boundary ++ scan.step(cur, t, m)
      } ++ (if (started) scan.flush(cur) else Vector.empty) // lazy: runs post-exhaustion
    }
  }

  /** Streaming: active runs per key, watermark-expired via
    * EventTimeTimeout at the earliest run's deadline. State is
    * windowSec-bounded: every run is at most windowSec old before it
    * times out. Same cross-batch ordering caveat as [[strictStreaming]].
    */
  def followedByStreaming[E](
      events: Dataset[E],
      key: E => Long,
      ts: E => Long,
      tieBreak: E => Long,
      steps: Seq[E => Boolean],
      windowSec: Long,
  ): Dataset[Out[FollowedMatch]] = {
    require(steps.nonEmpty, "pattern needs at least one step")
    require(steps.length <= 63, "pattern mask is a Long: at most 63 steps")
    implicit val outEnc = Encoders.product[Out[FollowedMatch]]
    implicit val stEnc = Encoders.product[FollowedState]
    events
      .groupByKey(key)(Encoders.scalaLong)
      .flatMapGroupsWithState[FollowedState, Out[FollowedMatch]](
        OutputMode.Append(),
        GroupStateTimeout.EventTimeTimeout()) { (kid, it, state: GroupState[FollowedState]) =>
        val wmSec = state.getCurrentWatermarkMs() / 1000L
        val prev = state.getOption.map(_.runs.toVector).getOrElse(Vector.empty)
        // watermark expiry (both on timeout and on data): a run whose
        // deadline is at/under the watermark can never complete — any
        // future event has ts > wm >= firstTs + windowSec
        def expire(runs: Vector[Run]): (Vector[Run], Vector[Out[FollowedMatch]]) = {
          val (dead, alive) = runs.partition(r => r.firstTs + windowSec <= wmSec)
          (alive, dead.map(r =>
            Out(Out.Timeout, FollowedMatch(kid, r.firstTs, r.lastTs, r.matched))))
        }
        val (runs1, timedOut) = expire(prev)
        val (runs2, emitted) =
          if (state.hasTimedOut) (runs1, Vector.empty[Out[FollowedMatch]])
          else foldFollowed(
            kid, runs1, it.toSeq.sortBy(e => (ts(e), tieBreak(e))), ts, steps, windowSec)
        if (runs2.isEmpty) state.remove()
        else {
          state.update(FollowedState(runs2))
          val nextDeadline = runs2.map(r => (r.firstTs + windowSec) * 1000L).min
          state.setTimeoutTimestamp(math.max(nextDeadline, state.getCurrentWatermarkMs() + 1))
        }
        (timedOut ++ emitted).iterator
      }
  }

  /** Streaming: flatMapGroupsWithState carrying the last k-1 events per
    * key. Requires a watermarked input (the O(k) buffer is TTL'd).
    */
  def strictStreaming[E](
      events: Dataset[E],
      key: E => Long,
      ts: E => Long,
      tieBreak: E => Long,
      steps: Seq[E => Boolean],
      windowSec: Long,
  )(implicit bufEnc: Encoder[Seq[E]]): Dataset[SeqMatch] = {
    require(steps.nonEmpty, "pattern needs at least one step")
    implicit val outEnc = Encoders.product[SeqMatch]
    val k = steps.length
    events
      .groupByKey(key)(Encoders.scalaLong)
      .flatMapGroupsWithState[Seq[E], SeqMatch](
        OutputMode.Append(),
        GroupStateTimeout.EventTimeTimeout()) { (kid, it, state: GroupState[Seq[E]]) =>
        if (state.hasTimedOut) {
          state.remove() // watermark passed newest-buffered + window: inert
          Iterator.empty
        } else {
          val buf = state.getOption.getOrElse(Vector.empty)
          val run = (buf ++ it).sortBy(e => (ts(e), tieBreak(e)))
          // every k-window of `run` contains at least one THIS-batch event
          // (the carried buffer holds only k-1), so nothing here was
          // emitted by a previous invocation — no dedup filter needed
          val out = slideMatches(kid, run, ts, steps, windowSec).toVector
          state.update(run.takeRight(k - 1).toVector)
          state.setTimeoutTimestamp(math.max(
            (ts(run.last) + windowSec) * 1000L,
            state.getCurrentWatermarkMs() + 1))
          out.iterator
        }
      }
  }
}
