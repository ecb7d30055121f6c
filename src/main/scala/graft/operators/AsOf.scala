package graft.operators

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** As-of join (point-in-time enrichment): for every PROBE row, the BUILD
  * row of the same key with the greatest event time at-or-before the
  * probe's — the temporal join feature stores and training pipelines use
  * to attach "state as of then" without leaking the future.
  *
  * Spark has no native as-of join, and the join formulations all
  * degenerate at scale: an inequality theta-join plans as a cross
  * product, and the interval-join + rank form re-buffers per probe. The
  * scalable formulation is join-FREE — the same secondary-sort boundary
  * scan as [[Cep.maskedSorted]]: union both sides tagged, repartition on
  * the key, sort within partitions by (key, ts, side, tie), and
  * carry the latest build row forward in one streaming pass. One
  * all-data shuffle (the sort's), O(1) state per key (the carried build
  * row), no join operator anywhere in the plan.
  *
  * Tie rules, pinned by the oracle: a build row AT the probe's timestamp
  * matches (at-or-before, DuckDB `ASOF JOIN ... ON p.ts >= b.ts`
  * semantics); among equal-ts build rows the greatest `tie` wins
  * (deterministic, unlike raw ASOF on ties). Probes with no prior build
  * emit nulls (left-outer).
  */
object AsOf {

  /** One enriched probe row; `matchTs`/`matchId` null when no build row
    * precedes the probe.
    */
  final case class AsOfMatch(
      key: Long,
      probeId: Long,
      probeTs: Long,
      matchId: Option[Long],
      matchTs: Option[Long])

  /** Batch as-of enrichment. `tie` must be unique per (key, ts, side) —
    * an event id — so the carried winner is deterministic.
    */
  def lastAtOrBefore[E](
      events: Dataset[E],
      key: E => Long,
      ts: E => Long,
      tie: E => Long,
      isProbe: E => Boolean,
  ): Dataset[AsOfMatch] = {
    implicit val rowEnc = Encoders.product[(Long, Long, Long, Long)]
    implicit val outEnc = Encoders.product[AsOfMatch]
    import org.apache.spark.sql.functions.col
    events
      .map(e => (key(e), ts(e), if (isProbe(e)) 1L else 0L, tie(e)))
      .repartition(col("_1"))
      // builds (side 0) sort before probes at the same ts: at-or-before
      .sortWithinPartitions(col("_1"), col("_2"), col("_3"), col("_4"))
      .mapPartitions { it =>
        var cur = 0L
        var started = false
        var lastTs = 0L
        var lastId = 0L
        var has = false
        it.flatMap { case (k, t, side, id) =>
          if (!started || k != cur) { cur = k; started = true; has = false }
          if (side == 0L) {
            // sort order guarantees non-decreasing (ts, id): always newer
            lastTs = t; lastId = id; has = true
            Iterator.empty
          } else Iterator.single(AsOfMatch(
            k, id, t,
            if (has) Some(lastId) else None,
            if (has) Some(lastTs) else None))
        }
      }
  }

  /** The latest build row of one key — the streaming state. */
  final case class AsOfState(ts: Long, id: Long)

  /** Streaming as-of enrichment: flatMapGroupsWithState carrying the
    * latest build row per key — the "current feature value" pattern. The
    * state is O(1) per key and by default UN-expiring: an as-of match
    * may reach arbitrarily far back (a user's last view can precede the
    * purchase by months), so the per-key footprint is 16 bytes forever
    * rather than windowSec-bounded — the same retention a feature store
    * keeps. At billions of keys that default is a policy, not a law:
    * pass `maxAgeSec` to expire a key's carried build once the watermark
    * passes `build.ts + maxAgeSec` without a newer build arriving
    * (EventTimeTimeout — the input stream must carry a watermark).
    * Probes after expiry see null matches, the bounded-retention
    * trade the caller opted into. Same cross-batch ordering caveat as
    * the other streaming operators: events fold in event-time order
    * within a micro-batch; a late cross-batch probe matches the newest
    * NON-FUTURE build visible to it — the carried state if not ahead of
    * the probe, or an older build from its own batch — and null when
    * every visible build is ahead of it. The future never leaks into a
    * match.
    */
  def lastAtOrBeforeStreaming[E](
      events: Dataset[E],
      key: E => Long,
      ts: E => Long,
      tie: E => Long,
      isProbe: E => Boolean,
      maxAgeSec: Option[Long] = None,
  ): Dataset[AsOfMatch] = {
    implicit val outEnc = Encoders.product[AsOfMatch]
    implicit val stEnc = Encoders.product[AsOfState]
    val timeoutConf =
      if (maxAgeSec.isDefined) GroupStateTimeout.EventTimeTimeout()
      else GroupStateTimeout.NoTimeout()
    events
      .groupByKey(key)(Encoders.scalaLong)
      .flatMapGroupsWithState[AsOfState, AsOfMatch](
        OutputMode.Append(),
        timeoutConf) { (kid, it, state: GroupState[AsOfState]) =>
        if (state.hasTimedOut) {
          // retention horizon reached with no newer build: drop the key's
          // 16 bytes; later probes for it match null until a new build
          state.remove()
          Iterator.empty
        } else {
        // `carried` = latest build EVER seen (what the state stores);
        // `inBatch` = latest build folded so far in THIS batch. A probe
        // matches the best of the two that is not ahead of it: in-batch
        // builds fold in event-time order, so `inBatch` is always
        // at-or-before the probe, while `carried` may be a FUTURE build
        // relative to a late cross-batch probe and is guarded out (a
        // late probe must match an older build or null — never the
        // future).
        var carried = state.getOption.orNull
        var inBatch: AsOfState = null
        def newer(a: AsOfState, b: AsOfState): Boolean =
          b == null || a.ts > b.ts || (a.ts == b.ts && a.id > b.id)
        val out = Vector.newBuilder[AsOfMatch]
        // builds before probes at the same (ts): at-or-before semantics
        it.toSeq.sortBy(e => (ts(e), if (isProbe(e)) 1L else 0L, tie(e))).foreach { e =>
          if (isProbe(e)) {
            val cands = Seq(Option(inBatch),
              Option(carried).filter(_.ts <= ts(e))).flatten
            val m = cands.sortWith(newer).headOption
            out += AsOfMatch(kid, tie(e), ts(e), m.map(_.id), m.map(_.ts))
          } else {
            val b = AsOfState(ts(e), tie(e))
            if (newer(b, inBatch)) inBatch = b
            if (newer(b, carried)) carried = b
          }
        }
        if (carried != null) {
          state.update(carried)
          // expiry clock restarts from the newest build; clamp above the
          // current watermark — Spark rejects a timeout already in the
          // past, so a build arriving later than its own horizon lives
          // exactly one more micro-batch
          maxAgeSec.foreach { age =>
            state.setTimeoutTimestamp(
              math.max((carried.ts + age) * 1000L, state.getCurrentWatermarkMs() + 1L))
          }
        }
        out.result().iterator
        }
      }
  }
}
