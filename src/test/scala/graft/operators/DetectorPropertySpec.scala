package graft.operators

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.SparkSpec
import graft.model._

/** Property tests: the stateful detectors hold their invariants on random
  * event streams, not just the bundled fixtures (SURVEY §5's "property
  * tests against a naive oracle" item).
  *
  * Case sizes stay small (Spark job per case); minSuccessful keeps total
  * runtime in check while still walking a few thousand random events.
  */
class DetectorPropertySpec extends SparkSpec {

  /** scalatestplus isn't on the offline classpath, so properties are driven
    * directly: 10 deterministic seeds per generator (reproducible failures
    * — the seed number prints in the assertion message).
    */
  private def forAllSeeded[A](gen: Gen[A])(check: A => Unit): Unit =
    (1 to 10).foreach { i =>
      gen.apply(Gen.Parameters.default, Seed(i.toLong)) match {
        case Some(a) =>
          try check(a)
          catch {
            case e: Throwable =>
              throw new AssertionError(s"property failed for seed=$i: ${e.getMessage}", e)
          }
        case None => ()
      }
    }

  private val loginGen: Gen[List[LoginEvent]] = for {
    n <- Gen.choose(20, 120)
    events <- Gen.listOfN(n, for {
      user <- Gen.choose(1L, 6L)
      state <- Gen.oneOf("fail", "fail", "success") // fail-heavy
      ts <- Gen.choose(1000L, 1100L)
    } yield LoginEvent(user, "ip", state, ts))
  } yield events

  test("eager login detector == lag-window SQL oracle on random streams") {
    import spark.implicits._
    forAllSeeded(loginGen) { events =>
      if (events.nonEmpty) {
        // events with identical (user, ts) make lag() order ambiguous
        // between the two formulations; dedupe to keep the oracle exact
        val distinctEvents = events
          .groupBy(e => (e.userId, e.timestamp)).map(_._2.head).toSeq
        val ds = spark.createDataset(distinctEvents)
        val got = LoginFailDetector.eagerBatch(ds, windowSec = 2).collect().toSet
        ds.createOrReplaceTempView("prop_logins")
        val expected = spark.sql("""
          SELECT userId, prevTs, timestamp FROM (
            SELECT userId, timestamp, loginState,
                   lag(loginState) OVER (PARTITION BY userId ORDER BY timestamp, loginState) AS prevState,
                   lag(timestamp)  OVER (PARTITION BY userId ORDER BY timestamp, loginState) AS prevTs
            FROM prop_logins)
          WHERE loginState = 'fail' AND prevState = 'fail' AND timestamp - prevTs <= 2
        """).collect().map(r =>
          LoginFailWarning(r.getLong(0), r.getLong(1), r.getLong(2), LoginFailDetector.warnMsg))
          .toSet
        assert(got === expected)
      }
    }
  }

  /** Realistic lifecycles: per order at most one create and one pay (the
    * reference's data model — duplicate creates/pays per key overwrite
    * ValueState in the reference too, silently dropping events, so
    * conservation invariants only hold on well-formed streams).
    */
  private val orderGen: Gen[List[OrderEvent]] = for {
    nOrders <- Gen.choose(5, 15)
    perOrder <- Gen.sequence[List[List[OrderEvent]], List[OrderEvent]](
      (1L to nOrders).toList.map { order =>
        for {
          hasCreate <- Gen.frequency(4 -> true, 1 -> false)
          hasPay <- Gen.frequency(3 -> true, 1 -> false)
          cTs <- Gen.choose(1000L, 2000L)
          pGap <- Gen.choose(1L, 1500L)
        } yield {
          val create = if (hasCreate) List(OrderEvent(order, "create", "", cTs)) else Nil
          val pay = if (hasPay) List(OrderEvent(order, "pay", s"tx$order", cTs + pGap)) else Nil
          create ++ pay
        }
      })
  } yield perOrder.flatten

  test("order-pay detector: every order resolves, channels match outcomes") {
    import spark.implicits._
    forAllSeeded(orderGen) { events =>
      if (events.nonEmpty) {
        val ds = spark.createDataset(events)
        val out = OrderPayDetector.batch(ds, timeoutSec = 900).collect()
        val byOrder = out.groupBy(_.value.orderId)
        // every order with at least one event produces at least one result
        assert(events.map(_.orderId).toSet === byOrder.keySet)
        out.foreach { o =>
          if (o.value.resultState == OrderPayDetector.Success) assert(o.channel === Out.Main)
          else assert(o.channel === Out.Timeout)
        }
        // a create either matches (Success / PayedButTimeout) or times out
        val creates = events.count(_.eventType == "create")
        val createResolutions = out.map(_.value.resultState).count(s =>
          s == OrderPayDetector.Success || s == OrderPayDetector.PayedButTimeout ||
            s == OrderPayDetector.TimedOut)
        assert(createResolutions === creates)
        // every pay resolves too: matched, late, or stranded
        val pays = events.count(_.eventType == "pay")
        val payResolutions = out.map(_.value.resultState).count(s =>
          s == OrderPayDetector.Success || s == OrderPayDetector.PayedButTimeout ||
            s == OrderPayDetector.PayedNoCreate)
        assert(payResolutions === pays)
      }
    }
  }

  /** Unique txId per side (the reference's data model — a duplicate txId
    * overwrites ValueState and silently drops the earlier event there too).
    */
  private val txGen: Gen[(List[OrderEvent], List[ReceiptEvent])] = for {
    payIds <- Gen.someOf(1L to 20L)
    receiptIds <- Gen.someOf(1L to 20L)
    payTss <- Gen.listOfN(payIds.size, Gen.choose(1000L, 1200L))
    receiptTss <- Gen.listOfN(receiptIds.size, Gen.choose(1000L, 1200L))
  } yield (
    payIds.toList.zip(payTss).map { case (id, ts) => OrderEvent(id, "pay", s"tx$id", ts) },
    receiptIds.toList.zip(receiptTss).map { case (id, ts) => ReceiptEvent(s"tx$id", "wechat", ts) },
  )

  test("tx matcher: conservation — every event lands in exactly one channel") {
    import spark.implicits._
    forAllSeeded(txGen) { case (pays, receipts) =>
      if (pays.nonEmpty && receipts.nonEmpty) {
        val out = TxMatcher
          .coMatchBatch(spark.createDataset(pays), spark.createDataset(receipts))
          .collect()
        val matched = out.count(_.channel == Out.Main)
        val strandedPays = out.count(_.channel == Out.UnmatchedLeft)
        val strandedReceipts = out.count(_.channel == Out.UnmatchedRight)
        assert(matched + strandedPays === pays.length)
        assert(matched + strandedReceipts === receipts.length)
        // matched pairs agree on txId
        out.filter(_.channel == Out.Main).foreach { m =>
          assert(m.pay.get.txId === m.receipt.get.txId)
        }
      }
    }
  }

  private val clickGen: Gen[List[AdClickEvent]] = for {
    n <- Gen.choose(30, 150)
    events <- Gen.listOfN(n, for {
      user <- Gen.choose(1L, 4L)
      ad <- Gen.choose(1L, 3L)
      // two event-time days so the midnight reset is exercised
      ts <- Gen.choose(0L, 2L * 86400L - 1)
    } yield AdClickEvent(user, ad, "prov", "city", ts))
  } yield events

  test("blacklist: reference pre-increment semantics hold on random streams") {
    import spark.implicits._
    val threshold = 3
    forAllSeeded(clickGen) { events =>
      val clicks = events.toDS()
      val out = AdBlacklist.batch(clicks, threshold).collect()
      val mains = out.filter(_.channel == Out.Main).flatMap(_.click)
      val warnings = out.filter(_.channel == Out.Alert).flatMap(_.warning)
      val byKeyDay = events.groupBy(e =>
        (e.userId, e.adId, e.timestamp - math.floorMod(e.timestamp, 86400L)))
      // main carries the FIRST min(n, threshold) clicks per key-day; the
      // warning fires exactly once, on click threshold+1
      byKeyDay.foreach { case (k, evs) =>
        val mainCount = mains.count(c =>
          (c.userId, c.adId, c.timestamp - math.floorMod(c.timestamp, 86400L)) == k)
        assert(mainCount === math.min(evs.length, threshold), s"key-day $k")
      }
      val overKeys = byKeyDay.filter(_._2.length > threshold).keys
        .map(k => (k._1, k._2)).toSet
      assert(warnings.map(w => (w.userId, w.adId)).toSet === overKeys)
      assert(warnings.length ===
        byKeyDay.count(_._2.length > threshold))
      // the main clicks are the time-earliest ones of each key-day
      byKeyDay.foreach { case (k, evs) =>
        val kept = mains.filter(c =>
          (c.userId, c.adId, c.timestamp - math.floorMod(c.timestamp, 86400L)) == k)
        val expected = evs.sortBy(_.timestamp).take(threshold)
        assert(kept.map(_.timestamp).sorted.toSeq === expected.map(_.timestamp).sorted.toSeq,
          s"key-day $k keeps its earliest clicks")
      }
    }
  }
}
