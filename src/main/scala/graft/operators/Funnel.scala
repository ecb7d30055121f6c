package graft.operators

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Relaxed-contiguity 3-step funnel COUNT — the Flink CEP
  * `begin.followedBy.followedBy.within(window)` all-matches family
  * (SURVEY §2.8 J4; reference analog OrderPayTimeOut.java:52-76) when the
  * caller wants per-key COMPLETION COUNTS rather than the match list.
  *
  * The relational formulation (two per-key range joins, then
  * `groupBy(key).count`) enumerates every ordered (first, mid, last)
  * triple before counting — within-key cubic: a bot key with 10^4 of each
  * step materializes ~10^12 intermediate rows in one join task. This
  * operator computes the SAME count in one per-key ordered scan,
  * O(n log n) time and O(#first + #mid) space per key, never
  * materializing a single triple:
  *
  * For a step-3 event at time T (window cutoff L = T - windowSec), its
  * triple count is Σ over prior step-2 events b of max(0, k_b - j), where
  *   k_b = number of step-1 events before b (strictly, in (ts, tieBreak)
  *         order) — non-decreasing as b advances, and
  *   j   = number of step-1 events with ts < L (these are too old to
  *         anchor a window containing T).
  * Since k is sorted, the sum collapses to one binary search for the
  * first qualifying step-2 index a (k ≥ j+1) plus a prefix-sum lookup:
  *   Σ = (suffixSum of k from a) - (#clicks - a) · j.
  *
  * 100 TB shape: one shuffle on the key (like Flink's keyBy), per-key
  * linear state, per-event O(log n) — hot-key cost is no longer
  * multiplicative in per-step activity.
  */
object Funnel {

  final case class KeyCount(key: Long, triples: Long)

  /** first index in [0, len) with buf(idx) >= target (buf non-decreasing) */
  private def lowerBound(buf: collection.IndexedSeq[Long], target: Long): Int = {
    var lo = 0
    var hi = buf.length
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (buf(mid) >= target) hi = mid else lo = mid + 1
    }
    lo
  }

  /** Mutable per-key scan state. `evicted` counts step-1 events dropped by
    * the streaming watermark eviction; step-2 `k` values stay ABSOLUTE
    * (include evicted step-1s) so contributions are unchanged by eviction.
    */
  private final class TripleCounter(
      windowSec: Long,
      evicted0: Long = 0L,
      views0: Seq[Long] = Nil,
      clicks0: Seq[Long] = Nil) {
    val viewTs = ArrayBuffer.empty[Long] // step-1 event times, non-decreasing
    val clickK = ArrayBuffer.empty[Long] // step-1 count before each step-2, non-decreasing
    private val clickKSum = ArrayBuffer(0L) // prefix sums of clickK
    val evicted: Long = evicted0
    var total = 0L

    viewTs ++= views0
    clicks0.foreach(appendClick)

    private def appendClick(k: Long): Unit = {
      clickK += k
      clickKSum += (clickKSum(clickKSum.length - 1) + k)
    }

    def onLast(ts: Long): Unit = {
      // j = absolute count of step-1 events too old for this window
      val j = evicted + lowerBound(viewTs, ts - windowSec)
      val a = lowerBound(clickK, j + 1) // step-2s with k <= j contribute 0
      val q = clickK.length
      total += (clickKSum(q) - clickKSum(a)) - (q - a).toLong * j
    }

    def onMid(): Unit = appendClick(evicted + viewTs.length)

    def onFirst(ts: Long): Unit = viewTs += ts
  }

  /** Batch: per-key (ts, tieBreak)-ordered scan. An event may satisfy
    * several step predicates (e.g. identical step types); within one
    * event, the step-3 count is taken before the event registers as
    * step-2/step-1, matching the strict `<` ordering of the join form
    * (an event never pairs with itself).
    *
    * Shuffle shape: SECONDARY SORT — repartition on the key, sort within
    * partitions by (key, ts, tieBreak), then one streaming pass with
    * key-boundary detection. Unlike a `flatMapGroups` + in-group sort,
    * no task ever materializes a key's full event list: the sort is
    * Spark's spillable external sorter, and per-key memory is the
    * step-1/step-2 arrays alone — a 10^8-event bot key costs two long
    * arrays, not 10^8 buffered objects.
    */
  def countTriplesBatch[E](
      events: Dataset[E],
      key: E => Long,
      ts: E => Long,
      tieBreak: E => Long,
      isFirst: E => Boolean,
      isMid: E => Boolean,
      isLast: E => Boolean,
      windowSec: Long,
  ): Dataset[KeyCount] = {
    implicit val outEnc = Encoders.product[KeyCount]
    implicit val rowEnc = org.apache.spark.sql.catalyst.encoders
      .ExpressionEncoder[(Long, Long, Long, Boolean, Boolean, Boolean)]()
    import org.apache.spark.sql.functions.col
    events
      .map(e => (key(e), ts(e), tieBreak(e), isFirst(e), isMid(e), isLast(e)))
      .repartition(col("_1"))
      .sortWithinPartitions(col("_1"), col("_2"), col("_3"))
      .mapPartitions { it =>
        val res = scala.collection.mutable.ArrayBuffer.empty[KeyCount]
        var cur = 0L
        var c: TripleCounter = null
        def flush(): Unit = if (c != null && c.total > 0) res += KeyCount(cur, c.total)
        it.foreach { case (k, t, _, f, m, l) =>
          if (c == null || k != cur) { flush(); cur = k; c = new TripleCounter(windowSec) }
          if (l) c.onLast(t)
          if (m) c.onMid()
          if (f) c.onFirst(t)
        }
        flush()
        res.iterator
      }
  }

  /** Serializable streaming state: step-1 times still inside the horizon,
    * absolute step-2 k values, evicted-step-1 offset, running total.
    */
  final case class FunnelState(
      evicted: Long,
      viewTs: Vector[Long],
      clickK: Vector[Long],
      total: Long)

  /** Streaming twin: update-mode running per-key totals via
    * flatMapGroupsWithState. State is WATERMARK-BOUNDED, not
    * activity-bounded: step-1 events older than (watermark - windowSec)
    * can never anchor a future window (any later step-3 has ts ≥
    * watermark), so they are evicted and only counted through the
    * `evicted` offset; step-2 entries whose absolute k ≤ evicted can
    * never contribute again (j only grows) and are dropped with them.
    * Keys idle for windowSec past their newest event compact to a
    * ~40-byte tombstone (offset + running total) via the event-time
    * timeout — the irreducible per-key state of an exact running count.
    *
    * Same cross-batch ordering caveat as [[Cep.strictStreaming]]: events
    * are folded in event-time order within a micro-batch; an event
    * arriving in a later batch than a younger same-key neighbour is
    * folded in arrival order (ascending-watermark assumption). The batch
    * scan is the exact-order oracle; the parity spec replays in order.
    *
    * Emits (key, runningTotal) whenever the total advances.
    */
  def countStreaming[E](
      events: Dataset[E],
      key: E => Long,
      ts: E => Long,
      tieBreak: E => Long,
      isFirst: E => Boolean,
      isMid: E => Boolean,
      isLast: E => Boolean,
      windowSec: Long,
  ): Dataset[KeyCount] = {
    implicit val outEnc = Encoders.product[KeyCount]
    implicit val stEnc = Encoders.product[FunnelState]
    events
      .groupByKey(key)(Encoders.scalaLong)
      .flatMapGroupsWithState[FunnelState, KeyCount](
        OutputMode.Update(),
        GroupStateTimeout.EventTimeTimeout()) { (kid, it, state: GroupState[FunnelState]) =>
        if (state.hasTimedOut) {
          // The watermark passed (newest event + windowSec): every buffered
          // step-1 is dead for ANY future step-3 (its cutoff L > maxTs), so
          // compact to a tombstone — buffers dropped, but the running total
          // and the eviction offset survive (removing them would silently
          // reset the key's count when it reactivates). Folding the dropped
          // step-1s into `evicted` keeps future k/j bookkeeping consistent;
          // dropped step-2s all have k <= new evicted, so they could never
          // contribute again. ~40 bytes/key retained — the irreducible
          // state of an exact per-key running count.
          val st = state.get
          state.update(FunnelState(
            st.evicted + st.viewTs.length, Vector.empty, Vector.empty, st.total))
          Iterator.empty
        } else {
          val prev = state.getOption.getOrElse(FunnelState(0L, Vector.empty, Vector.empty, 0L))
          // restore the scan (prefix sums rebuilt in the constructor);
          // total starts at 0 so it counts only THIS batch's completions
          val c = new TripleCounter(windowSec, prev.evicted, prev.viewTs, prev.clickK)
          val batch = it.toSeq.sortBy(e => (ts(e), tieBreak(e)))
          batch.foreach { e =>
            if (isLast(e)) c.onLast(ts(e))
            if (isMid(e)) c.onMid()
            if (isFirst(e)) c.onFirst(ts(e))
          }
          val newTotal = prev.total + c.total
          // watermark eviction: step-1s below (wm - windowSec) are dead
          val wmSec = state.getCurrentWatermarkMs() / 1000L
          val cutoff = wmSec - windowSec
          val dropV = lowerBound(c.viewTs, cutoff)
          val newEvicted = c.evicted + dropV
          val keptViews = c.viewTs.drop(dropV).toVector
          val dropC = lowerBound(c.clickK, newEvicted + 1)
          val keptClicks = c.clickK.drop(dropC).toVector
          val maxTs =
            if (batch.nonEmpty) ts(batch.last)
            else if (keptViews.nonEmpty) keptViews.last
            else wmSec
          state.update(FunnelState(newEvicted, keptViews, keptClicks, newTotal))
          state.setTimeoutTimestamp(math.max(
            (maxTs + windowSec) * 1000L,
            state.getCurrentWatermarkMs() + 1))
          if (c.total > 0) Iterator.single(KeyCount(kid, newTotal)) else Iterator.empty
        }
      }
  }
}
