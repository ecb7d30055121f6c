package graft.operators

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.model.{AdClickEvent, BlackListUserWarning}

/** Click-fraud blacklist filter (SURVEY §2.3 F7 / §2.7 G6 —
  * FilterBlackListUser, AdStatisticsByProvince.java:104-160).
  *
  * Per (userId, adId): count clicks; the first `threshold` clicks pass to
  * the main channel, and from click `threshold + 1` onward events are
  * suppressed with ONE warning on the alert channel (the reference checks
  * the pre-increment count against the bound and skips the increment while
  * suppressing — AdStatisticsByProvince.java:139-152). The
  * reference resets state at the next local midnight via a processing-time
  * timer; here the reset key is the event-time day (deterministic and
  * replayable — the documented semantic delta, same daily cadence).
  *
  * Envelope: `AdOut(channel, click?, warning?)` — main carries the
  * passed-through clicks, alert the warnings.
  *
  * Scale notes: state is one (count, sent) pair per active (user, ad, day)
  * key; the shuffle is keyed exactly like Flink's keyBy(userId, adId).
  */
object AdBlacklist {

  final case class AdOut(
      channel: String,
      click: Option[AdClickEvent],
      warning: Option[BlackListUserWarning],
  )

  final case class ClickCount(day: Long, count: Long, warningSent: Boolean)

  private def dayOf(tsSec: Long): Long = tsSec - math.floorMod(tsSec, 86400L)

  def warnMsg(threshold: Int): String = s"click over $threshold times today"

  /** Transition shared by batch and streaming. */
  def step(
      st: ClickCount,
      e: AdClickEvent,
      threshold: Int,
  ): (ClickCount, Seq[AdOut]) = {
    val day = dayOf(e.timestamp)
    val cur = if (st.day == day) st else ClickCount(day, 0L, warningSent = false) // midnight reset
    if (cur.count >= threshold) {
      // pre-increment count at the bound: suppress this click, warn once,
      // and leave the count where it is (the reference's early return skips
      // the increment)
      val warn =
        if (!cur.warningSent)
          Seq(AdOut(Out.Alert, None,
            Some(BlackListUserWarning(e.userId, e.adId, warnMsg(threshold)))))
        else Seq.empty
      (cur.copy(warningSent = true), warn)
    } else
      (ClickCount(day, cur.count + 1, cur.warningSent), Seq(AdOut(Out.Main, Some(e), None)))
  }

  /** Batch: per-(user, ad) time-ordered fold. */
  def batch(clicks: Dataset[AdClickEvent], threshold: Int = 100): Dataset[AdOut] = {
    implicit val enc = Encoders.product[AdOut]
    implicit val keyEnc = Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong)
    clicks
      .groupByKey(e => (e.userId, e.adId))
      .flatMapGroups { (_, events) =>
        var st = ClickCount(-1L, 0L, warningSent = false)
        events.toSeq.sortBy(_.timestamp).iterator.flatMap { e =>
          val (st2, out) = step(st, e, threshold)
          st = st2
          out
        }
      }
  }

  /** Streaming: flatMapGroupsWithState; the day-roll reset happens on the
    * first event of the new day. State is additionally TTL'd with an
    * event-time timeout at the END of the state's day — the streaming
    * analog of the reference's midnight clear
    * (AdStatisticsByProvince.java:132-136): a (user, ad) pair that clicks
    * once and goes idle would otherwise hold its counter forever, a state
    * store leak at 100 TB/day of clicks. Removal is semantically free:
    * [[step]] resets the counter on day change anyway, so a key recreated
    * by a next-day event starts from the same zero state.
    *
    * The input stream must carry a watermark (EventTimeTimeout requires
    * one) — attach `withWatermark` upstream, as the parity spec does.
    */
  def streaming(clicks: Dataset[AdClickEvent], threshold: Int = 100): Dataset[AdOut] = {
    implicit val stEnc = Encoders.product[ClickCount]
    implicit val outEnc = Encoders.product[AdOut]
    implicit val keyEnc = Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong)
    clicks
      .groupByKey(e => (e.userId, e.adId))
      .flatMapGroupsWithState[ClickCount, AdOut](
        OutputMode.Append(),
        GroupStateTimeout.EventTimeTimeout()) { (_, events, state: GroupState[ClickCount]) =>
        if (state.hasTimedOut) {
          state.remove() // idle past its day's end: drop the counter
          Iterator.empty
        } else {
          var st = state.getOption.getOrElse(ClickCount(-1L, 0L, warningSent = false))
          val out = Seq.newBuilder[AdOut]
          events.toSeq.sortBy(_.timestamp).foreach { e =>
            val (st2, emitted) = step(st, e, threshold)
            st = st2
            emitted.foreach(out += _)
          }
          state.update(st)
          // expire when the watermark passes the end of the state's day
          // (clamped above the current watermark, which Spark requires)
          state.setTimeoutTimestamp(math.max(
            (st.day + 86400L) * 1000L,
            state.getCurrentWatermarkMs() + 1))
          out.result().iterator
        }
      }
  }
}
