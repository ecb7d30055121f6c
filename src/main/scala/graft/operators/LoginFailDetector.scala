package graft.operators

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.model.{LoginEvent, LoginFailWarning}

/** Brute-force login detection (SURVEY §2.7 G4/G5, §2.8 J3).
  *
  * Two variants, mirroring the reference:
  *
  *  - '''eager''' (LoginFail.java:126-170, the wired-in default): keep the
  *    last fail per user; a second fail within `windowSec` fires the warning
  *    immediately on arrival; a success clears. Strict contiguity — an
  *    intervening success resets the pattern (this is also exactly the CEP
  *    `fail next fail within 2s` pattern of LoginFailWithCep.java:52-69,
  *    implemented as the same 2-state NFA instead of a CEP library).
  *
  *  - '''timer''' (LoginFail.java:65-123): buffer fails, set an event-time
  *    timer at firstFail + windowSec; if ≥ maxFails fails accumulated when
  *    it fires, warn; a success before the timer clears everything.
  *
  * The transition logic is a pure function over (state, event) shared by the
  * batch path (per-key time-ordered fold via flatMapGroups) and the
  * streaming path (flatMapGroupsWithState, EventTimeTimeout).
  *
  * Scale notes: state per key is O(1) (eager) / O(fails-in-window) (timer);
  * the shuffle key is userId — the same partitioning Flink's keyBy uses —
  * and the batch fold sorts only each user's events in memory.
  */
object LoginFailDetector {

  val warnMsg = "login fail 2 times in 2s"

  /** Eager NFA step: (lastFail, event) → (newState, warning?). */
  def eagerStep(
      lastFail: Option[LoginEvent],
      e: LoginEvent,
      windowSec: Long,
  ): (Option[LoginEvent], Option[LoginFailWarning]) =
    if (e.loginState == "fail") {
      val warn = lastFail.collect {
        case first if e.timestamp - first.timestamp <= windowSec =>
          LoginFailWarning(e.userId, first.timestamp, e.timestamp, warnMsg)
      }
      (Some(e), warn)
    } else (None, None)

  /** Batch: per-user time-ordered fold of [[eagerStep]]. */
  def eagerBatch(logins: Dataset[LoginEvent], windowSec: Long = 2): Dataset[LoginFailWarning] = {
    implicit val enc = Encoders.product[LoginFailWarning]
    logins
      .groupByKey(_.userId)(Encoders.scalaLong)
      .flatMapGroups { (_, events) =>
        events.toSeq
          .sortBy(e => (e.timestamp, e.loginState))
          .iterator
          .scanLeft((Option.empty[LoginEvent], Option.empty[LoginFailWarning])) {
            case ((st, _), e) => eagerStep(st, e, windowSec)
          }
          .flatMap(_._2)
      }
  }

  /** Streaming: same NFA inside flatMapGroupsWithState. Events inside one
    * micro-batch are folded in event-time order; state carries the last
    * fail across batches. The eager variant emits on arrival (no output
    * timers, like the reference's no-timer processElement), but the
    * last-fail state is TTL'd with an event-time timeout at
    * `lastFail + windowSec`: once the watermark passes that point, any
    * future fail is necessarily outside the window, so the state can only
    * ever produce nothing — holding it would leak one row per user that
    * ever failed once (the reference leaks here too; the TTL is an
    * improvement, not a fidelity break). Requires a watermarked input.
    */
  def eagerStreaming(
      logins: Dataset[LoginEvent],
      windowSec: Long = 2,
  ): Dataset[LoginFailWarning] = {
    implicit val stEnc = Encoders.product[LoginEvent]
    implicit val outEnc = Encoders.product[LoginFailWarning]
    logins
      .groupByKey(_.userId)(Encoders.scalaLong)
      .flatMapGroupsWithState[LoginEvent, LoginFailWarning](
        OutputMode.Append(),
        GroupStateTimeout.EventTimeTimeout()) { (_, events, state: GroupState[LoginEvent]) =>
        if (state.hasTimedOut) {
          state.remove() // watermark passed lastFail + window: state is inert
          Iterator.empty
        } else {
          var st: Option[LoginEvent] = state.getOption
          val out = Seq.newBuilder[LoginFailWarning]
          events.toSeq.sortBy(e => (e.timestamp, e.loginState)).foreach { e =>
            val (st2, warn) = eagerStep(st, e, windowSec)
            st = st2
            warn.foreach(out += _)
          }
          st match {
            case Some(f) =>
              state.update(f)
              state.setTimeoutTimestamp(math.max(
                (f.timestamp + windowSec) * 1000L,
                state.getCurrentWatermarkMs() + 1))
            case None => state.remove()
          }
          out.result().iterator
        }
      }
  }

  /** Timer-variant state: buffered fails (time-ordered). */
  final case class FailBuffer(fails: Seq[LoginEvent])

  /** Timer variant, batch: fails buffered from the first fail; the
    * "timer" at firstFail + windowSec fires when a later event (or end of
    * input) moves per-key event time past it — if ≥ maxFails are buffered,
    * one warning spanning first→last fail is emitted
    * (LoginFail.java:91-117 onTimer).
    */
  def timerBatch(
      logins: Dataset[LoginEvent],
      maxFails: Int = 2,
      windowSec: Long = 2,
  ): Dataset[LoginFailWarning] = {
    implicit val enc = Encoders.product[LoginFailWarning]
    logins
      .groupByKey(_.userId)(Encoders.scalaLong)
      .flatMapGroups { (userId, events) =>
        val sorted = events.toSeq.sortBy(e => (e.timestamp, e.loginState))
        val out = Seq.newBuilder[LoginFailWarning]
        var fails = Vector.empty[LoginEvent]
        def fire(): Unit = {
          if (fails.size >= maxFails)
            out += LoginFailWarning(
              userId,
              fails.head.timestamp,
              fails.last.timestamp,
              s"login fail in ${windowSec}s for ${fails.size} times")
          fails = Vector.empty
        }
        sorted.foreach { e =>
          // fire a pending timer the moment event time passes it
          if (fails.nonEmpty && e.timestamp > fails.head.timestamp + windowSec) fire()
          if (e.loginState == "fail") fails :+= e
          else fails = Vector.empty // success clears state and timer
        }
        if (fails.nonEmpty) fire() // end of input = watermark → ∞
        out.result().iterator
      }
  }

  /** Timer variant, streaming: flatMapGroupsWithState with a real
    * event-time timeout at firstFail + windowSec.
    */
  def timerStreaming(
      logins: Dataset[LoginEvent],
      maxFails: Int = 2,
      windowSec: Long = 2,
  ): Dataset[LoginFailWarning] = {
    implicit val stEnc = Encoders.product[FailBuffer]
    implicit val outEnc = Encoders.product[LoginFailWarning]
    logins
      .groupByKey(_.userId)(Encoders.scalaLong)
      .flatMapGroupsWithState[FailBuffer, LoginFailWarning](
        OutputMode.Append(),
        GroupStateTimeout.EventTimeTimeout()) { (userId, events, state: GroupState[FailBuffer]) =>
        def warningOf(fails: Seq[LoginEvent]): Option[LoginFailWarning] =
          if (fails.size >= maxFails)
            Some(LoginFailWarning(userId, fails.head.timestamp, fails.last.timestamp,
              s"login fail in ${windowSec}s for ${fails.size} times"))
          else None
        if (state.hasTimedOut) {
          val fails = state.get.fails
          state.remove()
          warningOf(fails).iterator
        } else {
          // in-fold timer firing (see OrderPayDetector.foldEvents): a fail
          // burst whose window closes inside this micro-batch resolves here,
          // identically to the batch path
          var fails = state.getOption.map(_.fails.toVector).getOrElse(Vector.empty)
          val out = Seq.newBuilder[LoginFailWarning]
          events.toSeq.sortBy(e => (e.timestamp, e.loginState)).foreach { e =>
            if (fails.nonEmpty && e.timestamp > fails.head.timestamp + windowSec) {
              warningOf(fails).foreach(out += _)
              fails = Vector.empty
            }
            if (e.loginState == "fail") fails :+= e
            else fails = Vector.empty
          }
          if (fails.nonEmpty) {
            state.update(FailBuffer(fails))
            state.setTimeoutTimestamp(math.max(
              (fails.head.timestamp + windowSec) * 1000L,
              state.getCurrentWatermarkMs() + 1))
          } else state.remove()
          out.result().iterator
        }
      }
  }
}
