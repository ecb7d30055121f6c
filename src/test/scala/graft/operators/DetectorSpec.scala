package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.model._
import graft.sources.Fixtures

/** Stateful detectors over the reference fixtures, checked against
  * independent (SQL-window / join-based) oracles and fixture spot-checks.
  */
class DetectorSpec extends SparkSpec {

  private lazy val logins =
    Fixtures.logins(spark, s"$refBase/LoginFailDetect/src/main/resources/LoginLog.csv")
  private lazy val orderEvents =
    Fixtures.orders(spark, s"$refBase/OrderPayDetect/src/main/resources/OrderLog.csv")
  private lazy val receiptEvents =
    Fixtures.receipts(spark, s"$refBase/OrderPayDetect/src/main/resources/ReceiptLog.csv")
  private lazy val adClicks =
    Fixtures.adClicks(spark, s"$refBase/MarketAnalysis/src/main/resources/AdClickLog.csv")

  // ---- login fail -----------------------------------------------------

  test("eager login-fail detector matches the lag-window oracle") {
    val got = LoginFailDetector.eagerBatch(logins, windowSec = 2).collect().toSet

    // Independent oracle: consecutive (fail, fail) within 2s via lag() over
    // each user's time-ordered event sequence — the J3 batch formulation.
    logins.createOrReplaceTempView("logins")
    val expected = spark.sql("""
      SELECT userId, prevTs AS firstFailTime, timestamp AS lastFailTime
      FROM (
        SELECT userId, timestamp, loginState,
               lag(loginState) OVER (PARTITION BY userId ORDER BY timestamp, loginState) AS prevState,
               lag(timestamp)  OVER (PARTITION BY userId ORDER BY timestamp, loginState) AS prevTs
        FROM logins)
      WHERE loginState = 'fail' AND prevState = 'fail' AND timestamp - prevTs <= 2
    """).collect()
      .map(r => LoginFailWarning(r.getLong(0), r.getLong(1), r.getLong(2),
        LoginFailDetector.warnMsg))
      .toSet
    assert(got === expected)
    assert(got.nonEmpty) // the fixture contains brute-force sequences
  }

  test("timer login-fail variant warns only when >= maxFails within the window") {
    val got = LoginFailDetector.timerBatch(logins, maxFails = 2, windowSec = 2).collect()
    // every warning spans >= maxFails fails inside windowSec
    got.foreach { w =>
      assert(w.lastFailTime - w.firstFailTime <= 2)
      assert(w.warningMsg.startsWith("login fail in 2s for "))
    }
    // the notorious fixture user 1035 (dense fail burst) must be caught
    assert(got.exists(_.userId === 1035L))
  }

  test("eager streaming parity with batch (MemoryStream, two micro-batches)") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext

    val all = logins.collect().sortBy(_.timestamp)
    // split only where the timestamp strictly increases: after batch 1 the
    // watermark sits at max(h1), and a batch-2 row at that same timestamp
    // would be dropped as late (boundary rows straddling a tie are exactly
    // the rows a real out-of-order source would lose too)
    var cut = all.length / 2
    while (cut < all.length && all(cut - 1).timestamp >= all(cut).timestamp) cut += 1
    val (h1, h2) = all.splitAt(cut)

    val mem = MemoryStream[LoginEvent]
    // the eager NFA TTLs its last-fail state with an event-time timeout,
    // which requires a watermarked input
    val withTime = mem.toDS()
      .withColumn("eventTime", timestamp_seconds(col("timestamp")))
      .withWatermark("eventTime", "0 seconds")
      .as[LoginEvent]
    val query = LoginFailDetector
      .eagerStreaming(withTime, windowSec = 2)
      .writeStream
      .format("memory")
      .queryName("login_warnings")
      .outputMode("append")
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("ckpt-login").toString)
      .start()
    try {
      mem.addData(h1.toSeq)
      query.processAllAvailable()
      mem.addData(h2.toSeq)
      query.processAllAvailable()
      val streamed = spark.table("login_warnings").as[LoginFailWarning].collect().toSet
      val batch = LoginFailDetector.eagerBatch(logins, windowSec = 2).collect().toSet
      assert(streamed === batch)
    } finally query.stop()
  }

  // ---- order pay ------------------------------------------------------

  test("order-pay detector: the five outcomes partition the fixture") {
    import OrderPayDetector._
    val out = OrderPayDetector.batch(orderEvents, timeoutSec = 900).collect()
    val mine = out.groupBy(_.value.orderId)
      .view.mapValues(_.map(_.value.resultState).toSet).toMap

    // Independent join oracle. Timer-first semantics (the reference's
    // ascending-watermark behavior): a pay strictly past the deadline means
    // the create's timer fired first ("timeout"), leaving the pay stranded
    // ("payed but not found create event"); a pay exactly AT the deadline is
    // processed before the timer and takes the "payed but already timeout"
    // branch (OrderTimeOutOnProcess.java:110-118 strict <).
    orderEvents.createOrReplaceTempView("orders_ev")
    val oracle = spark.sql("""
      SELECT c.orderId, c.ts AS createTs, p.ts AS payTs
      FROM (SELECT orderId, timestamp AS ts FROM orders_ev WHERE eventType = 'create') c
      LEFT JOIN (SELECT orderId, MIN(timestamp) AS ts FROM orders_ev
                 WHERE eventType = 'pay' GROUP BY orderId) p
        ON p.orderId = c.orderId
    """).collect()

    oracle.foreach { r =>
      val orderId = r.getLong(0)
      val createTs = r.getLong(1)
      val expected =
        if (r.isNullAt(2)) Set(TimedOut)
        else {
          val payTs = r.getLong(2)
          if (payTs < createTs + 900) Set(Success)
          else if (payTs == createTs + 900) Set(PayedButTimeout)
          else Set(TimedOut, PayedNoCreate)
        }
      assert(mine.get(orderId).contains(expected), s"order $orderId")
    }
    // pay-without-create orders surface only on the timeout channel
    val createOrders = oracle.map(_.getLong(0)).toSet
    mine.keySet.diff(createOrders).foreach { orderId =>
      assert(mine(orderId) === Set(PayedNoCreate), s"order $orderId")
    }
    // channels are consistent with outcomes
    out.foreach { o =>
      if (o.value.resultState == Success) assert(o.channel === Out.Main)
      else assert(o.channel === Out.Timeout)
    }
  }

  test("order-pay streaming parity with batch") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext

    val all = orderEvents.collect().sortBy(_.timestamp)
    val (h1, h2) = all.splitAt(all.length / 2)
    // flush event far in the future: pushes the watermark past every timer
    // so trailing timeouts fire before the comparison (batch sees it too)
    val flush = OrderEvent(-1L, "create", "", all.last.timestamp + 100000L)

    val mem = MemoryStream[OrderEvent]
    val withTime = mem.toDS()
      .withColumn("eventTime", timestamp_seconds(col("timestamp")))
      .withWatermark("eventTime", "0 seconds")
      .as[OrderEvent]
    val query = OrderPayDetector
      .streaming(withTime, timeoutSec = 900)
      .writeStream
      .format("memory")
      .queryName("order_results")
      .outputMode("append")
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("ckpt-order").toString)
      .start()
    try {
      mem.addData(h1.toSeq)
      query.processAllAvailable()
      mem.addData(h2.toSeq :+ flush)
      query.processAllAvailable()
      // one extra empty batch lets timers registered in the flush batch fire
      mem.addData(Seq.empty[OrderEvent])
      query.processAllAvailable()
      val streamed = spark.table("order_results")
        .as[Out[OrderResult]].collect().filter(_.value.orderId != -1L).toSet
      val batch = OrderPayDetector
        .batch(orderEvents.unionByName(Seq(flush).toDS()), timeoutSec = 900)
        .collect().filter(_.value.orderId != -1L).toSet
      assert(streamed === batch)
    } finally query.stop()
  }

  // ---- tx matching ----------------------------------------------------

  test("interval join matches pay/receipt pairs inside [-3s, +5s]") {
    val matched = TxMatcher.intervalJoin(orderEvents, receiptEvents).collect()
    assert(matched.nonEmpty)
    matched.foreach { m =>
      assert(m.pay.txId === m.receipt.txId)
      val d = m.receipt.timestamp - m.pay.timestamp
      assert(d >= -3 && d <= 5)
    }
    // fixture spot-check: txId sd76f87d6 pays at 1558430844, receipt at 1558430847
    assert(matched.exists(m => m.pay.txId == "sd76f87d6" && m.receipt.timestamp == 1558430847L))
  }

  test("coMatch emits matches plus both unmatched side channels") {
    val out = TxMatcher.coMatchBatch(orderEvents, receiptEvents).collect()
    val matches = out.filter(_.channel == Out.Main)
    val unmatchedPays = out.filter(_.channel == Out.UnmatchedLeft)
    val unmatchedReceipts = out.filter(_.channel == Out.UnmatchedRight)

    // conservation: every pay event with txId lands in exactly one channel
    val nPays = orderEvents.filter(col("txId") =!= "").count()
    val nReceipts = receiptEvents.count()
    assert(matches.length + unmatchedPays.length === nPays.toInt)
    assert(matches.length + unmatchedReceipts.length === nReceipts.toInt)
    // matched pairs agree on txId
    matches.foreach(m => assert(m.pay.get.txId === m.receipt.get.txId))
    // a pay whose receipt never arrives is stranded
    assert(unmatchedPays.nonEmpty || unmatchedReceipts.nonEmpty)
  }

  test("coMatch streaming parity with batch") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext

    val flushPay = OrderEvent(-1L, "pay", "zzz-flush", 1558500000L)
    val memP = MemoryStream[OrderEvent]
    val memR = MemoryStream[ReceiptEvent]
    val ckpt = java.nio.file.Files.createTempDirectory("ckpt-tx").toString
    // Deterministic multi-batch driving: both sources are loaded BEFORE a
    // Trigger.AvailableNow query runs (a continuously-running query would
    // race the two addData calls and see all pays before any receipt — a
    // per-key arrival order the ts-sorted fold legitimately treats
    // differently). Each phase is a restart from the shared checkpoint.
    val collected = scala.collection.mutable.ArrayBuffer.empty[TxMatcher.TxOut]
    def runPhase(): Unit = {
      val q = TxMatcher
        .coMatchStreaming(memP.toDS(), memR.toDS())
        .writeStream
        .foreachBatch { (batch: org.apache.spark.sql.Dataset[TxMatcher.TxOut], _: Long) =>
          collected.synchronized { collected ++= batch.collect() }
          ()
        }
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    memP.addData(orderEvents.collect().toSeq)
    memR.addData(receiptEvents.collect().toSeq)
    runPhase()
    memP.addData(Seq(flushPay)) // advances the watermark past every timer
    runPhase()
    memP.addData(Seq.empty[OrderEvent]) // empty batch lets those timers fire
    runPhase()
    val streamed = collected.filterNot(_.pay.exists(_.orderId == -1L)).toSet
    val batch = TxMatcher
      .coMatchBatch(orderEvents.unionByName(Seq(flushPay).toDS()), receiptEvents)
      .collect().filterNot(_.pay.exists(_.orderId == -1L)).toSet
    assert(streamed === batch)
  }

  test("fullOuterReconcile covers every event across the three channels") {
    val df = TxMatcher.fullOuterReconcile(orderEvents, receiptEvents).cache()
    val matched = df.filter(col("channel") === Out.Main).count()
    val uLeft = df.filter(col("channel") === Out.UnmatchedLeft).count()
    val uRight = df.filter(col("channel") === Out.UnmatchedRight).count()
    val nPays = orderEvents.filter(col("txId") =!= "").count()
    val nReceipts = receiptEvents.count()
    // a pay can match several receipts in the interval; conservation is on
    // the unmatched sides: every pay/receipt appears matched or stranded
    assert(matched + uLeft >= nPays)
    assert(matched + uRight >= nReceipts)
    assert(df.filter(col("channel") === Out.Main)
      .filter(col("p_txId") =!= col("r_txId")).count() === 0)
    df.unpersist()
  }

  // ---- ad blacklist ---------------------------------------------------

  test("blacklist suppresses clicks at the threshold and warns once") {
    val threshold = 3
    val out = AdBlacklist.batch(adClicks, threshold).collect()
    val mains = out.filter(_.channel == Out.Main).flatMap(_.click)
    val warnings = out.filter(_.channel == Out.Alert).flatMap(_.warning)

    // oracle: per (user, ad, day) counts
    adClicks.createOrReplaceTempView("ad_clicks")
    val counts = spark.sql("""
      SELECT userId, adId, timestamp - pmod(timestamp, 86400) AS day, COUNT(*) AS n
      FROM ad_clicks GROUP BY 1, 2, 3
    """).collect().map(r => ((r.getLong(0), r.getLong(1), r.getLong(2)), r.getLong(3))).toMap

    // exactly one warning per (user, ad, day) EXCEEDING the threshold — the
    // reference checks the pre-increment count, so click threshold+1 is the
    // first suppressed one
    val overKeys = counts.filter(_._2 > threshold).keys.map(k => (k._1, k._2)).toSet
    assert(warnings.map(w => (w.userId, w.adId)).toSet === overKeys)
    assert(warnings.length === counts.count(_._2 > threshold))
    // main stream holds min(n, threshold) clicks per key-day
    val mainCounts = mains.groupBy(c =>
      (c.userId, c.adId, c.timestamp - math.floorMod(c.timestamp, 86400L)))
      .view.mapValues(_.length.toLong).toMap
    counts.foreach { case (k, n) =>
      assert(mainCounts.getOrElse(k, 0L) === math.min(n, threshold.toLong))
    }
  }

  test("blacklist streaming parity with batch; idle counters expire at day end") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext

    val threshold = 3
    val all = adClicks.collect().sortBy(_.timestamp)
    // split at a strictly-increasing timestamp so no batch-2 row ties the
    // batch-1 watermark (see the login parity test)
    var cut = all.length / 2
    while (cut < all.length && all(cut - 1).timestamp >= all(cut).timestamp) cut += 1
    val (h1, h2) = all.splitAt(cut)
    // flush click three days past the last fixture event: pushes the
    // watermark beyond the end of every open day, so every day-keyed
    // counter's event-time timeout fires; only the flush key's own fresh
    // state may survive
    val flush = AdClickEvent(-1L, -1L, "px", "cx", all.last.timestamp + 3 * 86400L)

    val mem = MemoryStream[AdClickEvent]
    val withTime = mem.toDS()
      .withColumn("eventTime", timestamp_seconds(col("timestamp")))
      .withWatermark("eventTime", "0 seconds")
      .as[AdClickEvent]
    val query = AdBlacklist.streaming(withTime, threshold)
      .writeStream
      .format("memory")
      .queryName("ad_out_stream")
      .outputMode("append")
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("ckpt-ad").toString)
      .start()
    try {
      mem.addData(h1.toSeq)
      query.processAllAvailable()
      mem.addData(h2.toSeq :+ flush)
      query.processAllAvailable()
      // an extra empty batch lets the timeouts registered above fire
      mem.addData(Seq.empty[AdClickEvent])
      query.processAllAvailable()

      val streamed = spark.table("ad_out_stream").as[AdBlacklist.AdOut].collect()
        .filterNot(o => o.click.exists(_.userId == -1L) || o.warning.exists(_.userId == -1L))
        .toSet
      val batch = AdBlacklist.batch(adClicks, threshold).collect().toSet
      assert(streamed === batch)

      // the TTL assertion: all fixture-day counters are gone from the state
      // store; at most the flush key remains
      val stateRows = query.recentProgress
        .filter(_.stateOperators.nonEmpty)
        .map(_.stateOperators(0).numRowsTotal)
        .last
      assert(stateRows <= 1L, s"state rows not expired: $stateRows")
    } finally query.stop()
  }
}
