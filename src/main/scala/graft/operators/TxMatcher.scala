package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.model.{OrderEvent, ReceiptEvent, TxMatch}

/** Two-stream payment/receipt reconciliation (SURVEY §2.7 G8, §2.8 J1/J2).
  *
  * Two implementations, mirroring the reference's two jobs:
  *
  *  - '''intervalJoin''' (TxPayMatchByJoin.java:63-80): inner equi-join on
  *    txId with receipt time in [pay − lowerSec, pay + upperSec]. Batch: a
  *    plain range-condition join. Streaming: the identical expression is a
  *    watermarkable stream–stream join.
  *
  *  - '''coMatch''' (TxPayMatch.java:82-135): exact CoProcessFunction
  *    semantics — whichever side arrives first waits with a timer (pay
  *    waits `payWaitSec`, receipt waits `receiptWaitSec`); a match emits the
  *    pair; an expired timer emits the stranded side on its unmatched
  *    channel. Implemented as union → groupByKey(txId) → shared fold
  *    (batch: time-sorted with simulated timers; streaming:
  *    flatMapGroupsWithState + EventTimeTimeout).
  *
  * Scale notes: both sides shuffle once on txId (same as Flink's
  * keyBy+connect); state per key is one event per side, O(1).
  */
object TxMatcher {

  /** Either-side envelope for the unioned co-stream. */
  final case class TxEvent(
      txId: String,
      isPay: Boolean,
      timestamp: Long,
      pay: Option[OrderEvent],
      receipt: Option[ReceiptEvent],
  )

  /** Result envelope: matched pair or stranded side. */
  final case class TxOut(
      channel: String,
      pay: Option[OrderEvent],
      receipt: Option[ReceiptEvent],
  )

  final case class TxState(
      pay: Option[OrderEvent],
      receipt: Option[ReceiptEvent],
      timerTs: Long,
  )
  private val empty = TxState(None, None, 0L)

  /** J1: interval join, batch or streaming depending on the inputs.
    * Pays are pre-filtered to txId != '' (TxPayMatchByJoin.java:46).
    */
  def intervalJoin(
      pays: Dataset[OrderEvent],
      receipts: Dataset[ReceiptEvent],
      lowerSec: Long = 3,
      upperSec: Long = 5,
  ): Dataset[TxMatch] = {
    implicit val enc = Encoders.product[TxMatch]
    val p = pays.filter(col("txId") =!= "").as("p")
    val r = receipts.as("r")
    p.joinWith(
      r,
      col("p.txId") === col("r.txId") &&
        col("r.timestamp") >= col("p.timestamp") - lowerSec &&
        col("r.timestamp") <= col("p.timestamp") + upperSec)
      .map { case (pay, receipt) => TxMatch(pay, receipt) }
  }

  private def toUnion(
      pays: Dataset[OrderEvent],
      receipts: Dataset[ReceiptEvent],
  ): Dataset[TxEvent] = {
    implicit val enc = Encoders.product[TxEvent]
    val p = pays
      .filter(col("txId") =!= "")
      .map(o => TxEvent(o.txId, isPay = true, o.timestamp, Some(o), None))
    val r = receipts.map(rc => TxEvent(rc.txId, isPay = false, rc.timestamp, None, Some(rc)))
    p.unionByName(r)
  }

  /** processElement1/2: arrival of one side. */
  def step(
      st: TxState,
      e: TxEvent,
      payWaitSec: Long,
      receiptWaitSec: Long,
  ): (TxState, Option[TxOut]) =
    if (e.isPay) {
      st.receipt match {
        case Some(rc) => (empty, Some(TxOut(Out.Main, e.pay, Some(rc))))
        case None =>
          (st.copy(pay = e.pay, timerTs = (e.timestamp + payWaitSec) * 1000L), None)
      }
    } else {
      st.pay match {
        case Some(p) => (empty, Some(TxOut(Out.Main, Some(p), e.receipt)))
        case None =>
          (st.copy(receipt = e.receipt, timerTs = (e.timestamp + receiptWaitSec) * 1000L), None)
      }
    }

  /** onTimer: emit whichever side is stranded (both can be — the reference
    * checks each state independently).
    */
  def onTimer(st: TxState): Seq[TxOut] =
    st.pay.map(p => TxOut(Out.UnmatchedLeft, Some(p), None)).toSeq ++
      st.receipt.map(r => TxOut(Out.UnmatchedRight, None, Some(r))).toSeq

  private def hasState(st: TxState): Boolean = st.pay.nonEmpty || st.receipt.nonEmpty

  /** Shared per-key fold with in-fold timer firing (per-key event time,
    * `wm = ts − 1ms`) — see [[OrderPayDetector.foldEvents]] for why the
    * timer check lives inside the fold rather than relying on the global
    * watermark: it makes batch and streaming bit-identical.
    */
  def foldEvents(
      st0: TxState,
      events: Seq[TxEvent],
      payWaitSec: Long,
      receiptWaitSec: Long,
  ): (TxState, Seq[TxOut]) = {
    val out = Seq.newBuilder[TxOut]
    var st = st0
    events.sortBy(e => (e.timestamp, !e.isPay)).foreach { e =>
      if (hasState(st) && st.timerTs < e.timestamp * 1000L) {
        onTimer(st).foreach(out += _)
        st = empty
      }
      val (st2, emitted) = step(st, e, payWaitSec, receiptWaitSec)
      st = st2
      emitted.foreach(out += _)
    }
    (st, out.result())
  }

  /** G8 batch evaluation (end of input = watermark → ∞). */
  def coMatchBatch(
      pays: Dataset[OrderEvent],
      receipts: Dataset[ReceiptEvent],
      payWaitSec: Long = 5,
      receiptWaitSec: Long = 3,
  ): Dataset[TxOut] = {
    implicit val enc = Encoders.product[TxOut]
    toUnion(pays, receipts)
      .groupByKey(_.txId)(Encoders.STRING)
      .flatMapGroups { (_, events) =>
        val (st, out) = foldEvents(empty, events.toSeq, payWaitSec, receiptWaitSec)
        (out ++ onTimer(st)).iterator
      }
  }

  /** G8 streaming evaluation (EventTimeTimeout). The watermark is applied
    * here, AFTER the union — an upstream watermark column would not survive
    * the object-level `.map` into [[TxEvent]] (the event-time metadata tag
    * lives on a column, and flatMapGroupsWithState requires that column in
    * its child's output).
    */
  def coMatchStreaming(
      pays: Dataset[OrderEvent],
      receipts: Dataset[ReceiptEvent],
      payWaitSec: Long = 5,
      receiptWaitSec: Long = 3,
      watermarkDelay: String = "0 seconds",
  ): Dataset[TxOut] = {
    implicit val txEnc = Encoders.product[TxEvent]
    implicit val stEnc = Encoders.product[TxState]
    implicit val outEnc = Encoders.product[TxOut]
    toUnion(pays, receipts)
      .withColumn("eventTime", timestamp_seconds(col("timestamp")))
      .withWatermark("eventTime", watermarkDelay)
      .as[TxEvent]
      .groupByKey(_.txId)(Encoders.STRING)
      .flatMapGroupsWithState[TxState, TxOut](
        OutputMode.Append(),
        GroupStateTimeout.EventTimeTimeout()) { (_, events, state: GroupState[TxState]) =>
        if (state.hasTimedOut) {
          val st = state.get
          state.remove()
          onTimer(st).iterator
        } else {
          val (st, out) =
            foldEvents(state.getOption.getOrElse(empty), events.toSeq, payWaitSec, receiptWaitSec)
          if (hasState(st)) {
            state.update(st)
            state.setTimeoutTimestamp(math.max(st.timerTs, state.getCurrentWatermarkMs() + 1))
          } else state.remove()
          out.iterator
        }
      }
  }

  /** J2 as a relational plan: full-outer interval join — matches plus both
    * null-padded unmatched sides in one shot (the SURVEY §2.7 G8 "simple
    * path"); channels derived from null-ness.
    */
  def fullOuterReconcile(
      pays: Dataset[OrderEvent],
      receipts: Dataset[ReceiptEvent],
      lowerSec: Long = 3,
      upperSec: Long = 5,
  ): DataFrame = {
    val p = pays.filter(col("txId") =!= "").toDF("p_orderId", "p_eventType", "p_txId", "p_ts")
    val r = receipts.toDF("r_txId", "r_payChannel", "r_ts")
    p.join(
        r,
        col("p_txId") === col("r_txId") &&
          col("r_ts") >= col("p_ts") - lowerSec &&
          col("r_ts") <= col("p_ts") + upperSec,
        "full_outer")
      .withColumn(
        "channel",
        when(col("p_txId").isNotNull && col("r_txId").isNotNull, Out.Main)
          .when(col("p_txId").isNotNull, Out.UnmatchedLeft)
          .otherwise(Out.UnmatchedRight))
  }
}
