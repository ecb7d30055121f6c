package graft.operators

import org.apache.spark.sql.{Dataset, Encoder, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Generic strict-contiguity sequence CEP — the Flink CEP
  * `begin.next.….next.within(window)` pattern family (SURVEY §2.8 J3) for
  * ARBITRARY pattern length. The reference only ever needs length 2
  * (`fail next fail within 2s`, LoginFailWithCep.java:52-69), which
  * [[LoginFailDetector]] hard-codes as its eager NFA; this operator serves
  * any k-step strict pattern so a CEP user isn't limited to the two wired
  * jobs.
  *
  * Semantics: a match is k CONSECUTIVE events of one key (strict
  * contiguity — an intervening event of the same key breaks the run) in
  * per-key event-time order (ties broken by the caller's `tieBreak`)
  * where event i satisfies `steps(i)` and `last.ts - first.ts <=
  * windowSec`. Every position is tested, so overlapping matches all emit
  * (Flink's default no-skip after-match strategy).
  *
  * Scale: the batch path sorts only each key's own events inside
  * `flatMapGroups` (shuffle keyed like Flink's keyBy); the streaming path
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

  /** Batch: per-key time-ordered scan of every k-window. */
  def strictBatch[E](
      events: Dataset[E],
      key: E => Long,
      ts: E => Long,
      tieBreak: E => Long,
      steps: Seq[E => Boolean],
      windowSec: Long,
  ): Dataset[SeqMatch] = {
    require(steps.nonEmpty, "pattern needs at least one step")
    implicit val enc = Encoders.product[SeqMatch]
    events
      .groupByKey(key)(Encoders.scalaLong)
      .flatMapGroups { (kid, it) =>
        slideMatches(kid, it.toSeq.sortBy(e => (ts(e), tieBreak(e))), ts, steps, windowSec)
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
