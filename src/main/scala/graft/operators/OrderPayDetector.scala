package graft.operators

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.model.{OrderEvent, OrderResult}

/** Order create→pay lifecycle with timeout (SURVEY §2.7 G7, §2.8 J4).
  *
  * Faithful to OrderTimeOutOnProcess.java:63-146's five outcomes:
  *   - pay within deadline (either arrival order) → main "payed successfully"
  *   - pay after the deadline passed but before the timer fired →
  *     timeout-channel "payed but already timeout"
  *   - timer fires with only pay seen → timeout-channel
  *     "payed but not found create event"
  *   - timer fires with only create seen → timeout-channel "timeout"
  * (The CEP variant OrderPayTimeOut.java:56-70 computes the same
  * matched/timeout split with a 15 s window; this operator serves both,
  * parameterized by `timeoutSec`.)
  *
  * State machine is a pure per-key fold shared by batch (flatMapGroups over
  * time-sorted events with simulated event-time timers: a pending timer
  * fires when per-key event time passes it, and end-of-input is watermark→∞)
  * and streaming (flatMapGroupsWithState + EventTimeTimeout).
  *
  * Scale notes: O(1) state per orderId; shuffle key = orderId (Flink's
  * keyBy); output channels split via [[Out]].
  */
object OrderPayDetector {

  val Success = "payed successfully"
  val PayedButTimeout = "payed but already timeout"
  val PayedNoCreate = "payed but not found create event"
  val TimedOut = "timeout"

  /** Per-order state: which sides arrived + pending timer (epoch ms). */
  final case class OrderState(
      isCreated: Boolean,
      isPayed: Boolean,
      payTs: Long,
      timerTs: Long,
  )
  private val empty = OrderState(isCreated = false, isPayed = false, 0L, 0L)

  /** Timer expiry (OrderTimeOutOnProcess.java:123-146 onTimer). */
  def onTimer(orderId: Long, st: OrderState): Out[OrderResult] =
    if (st.isPayed) Out(Out.Timeout, OrderResult(orderId, PayedNoCreate))
    else Out(Out.Timeout, OrderResult(orderId, TimedOut))

  /** Event transition (processElement). Returns (state', emitted, clearTimer). */
  def step(
      st: OrderState,
      e: OrderEvent,
      timeoutSec: Long,
  ): (OrderState, Option[Out[OrderResult]]) =
    e.eventType match {
      case "create" =>
        if (st.isPayed) // out-of-order pay-before-create, already payed → success
          (empty, Some(Out(Out.Main, OrderResult(e.orderId, Success))))
        else {
          val timerTs = (e.timestamp + timeoutSec) * 1000L
          (st.copy(isCreated = true, timerTs = timerTs), None)
        }
      case "pay" =>
        if (st.isCreated) {
          val r =
            if (e.timestamp * 1000L < st.timerTs) Out(Out.Main, OrderResult(e.orderId, Success))
            else Out(Out.Timeout, OrderResult(e.orderId, PayedButTimeout))
          (empty, Some(r))
        } else // pay before create: wait (watermark latency) for the create
          (st.copy(isPayed = true, payTs = e.timestamp, timerTs = e.timestamp * 1000L), None)
      case _ => (st, None)
    }

  private def hasState(st: OrderState): Boolean = st.isCreated || st.isPayed

  /** Shared per-key fold: before each event, a pending timer whose
    * timestamp lies strictly below the event's time fires (per-key event
    * time — the ascending-watermark view `wm = ts − 1ms` the reference jobs
    * run under). Keeping this INSIDE the fold makes batch and streaming
    * produce identical outcomes regardless of micro-batch boundaries
    * (Spark's global watermark only advances between batches, so a
    * same-batch late pay would otherwise take a different path than the
    * reference's timer-first order).
    */
  def foldEvents(
      orderId: Long,
      st0: OrderState,
      events: Seq[OrderEvent],
      timeoutSec: Long,
  ): (OrderState, Seq[Out[OrderResult]]) = {
    val out = Seq.newBuilder[Out[OrderResult]]
    var st = st0
    events.sortBy(e => (e.timestamp, e.eventType)).foreach { e =>
      if (hasState(st) && st.timerTs < e.timestamp * 1000L) {
        out += onTimer(orderId, st)
        st = empty
      }
      val (st2, emitted) = step(st, e, timeoutSec)
      st = st2
      emitted.foreach(out += _)
    }
    (st, out.result())
  }

  /** Batch evaluation over a bounded Dataset (end of input = watermark→∞,
    * so every pending timer fires).
    */
  def batch(orders: Dataset[OrderEvent], timeoutSec: Long = 900): Dataset[Out[OrderResult]] = {
    implicit val enc = Encoders.product[Out[OrderResult]]
    orders
      .groupByKey(_.orderId)(Encoders.scalaLong)
      .flatMapGroups { (orderId, events) =>
        val (st, out) = foldEvents(orderId, empty, events.toSeq, timeoutSec)
        (if (hasState(st)) out :+ onTimer(orderId, st) else out).iterator
      }
  }

  /** Streaming evaluation: the shared fold handles same-batch timer order;
    * the real EventTimeTimeout covers keys whose deadline passes with no
    * further events.
    */
  def streaming(orders: Dataset[OrderEvent], timeoutSec: Long = 900): Dataset[Out[OrderResult]] = {
    implicit val stEnc = Encoders.product[OrderState]
    implicit val outEnc = Encoders.product[Out[OrderResult]]
    orders
      .groupByKey(_.orderId)(Encoders.scalaLong)
      .flatMapGroupsWithState[OrderState, Out[OrderResult]](
        OutputMode.Append(),
        GroupStateTimeout.EventTimeTimeout()) { (orderId, events, state: GroupState[OrderState]) =>
        if (state.hasTimedOut) {
          val st = state.get
          state.remove()
          Iterator.single(onTimer(orderId, st))
        } else {
          val (st, out) =
            foldEvents(orderId, state.getOption.getOrElse(empty), events.toSeq, timeoutSec)
          if (hasState(st)) {
            state.update(st)
            // a timeout timestamp at/under the watermark is rejected; clamp
            // so an already-passed deadline fires on the next batch
            state.setTimeoutTimestamp(math.max(st.timerTs, state.getCurrentWatermarkMs() + 1))
          } else state.remove()
          out.iterator
        }
      }
  }
}
