package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.model.LoginEvent
import graft.sources.Fixtures

/** The generic k-step strict-contiguity CEP operator, cross-checked
  * against the hard-coded 2-step login NFA and its own streaming form.
  */
class CepSpec extends SparkSpec {

  private lazy val logins =
    Fixtures.logins(spark, s"$refBase/LoginFailDetect/src/main/resources/LoginLog.csv")

  // mirror eagerBatch's (timestamp, loginState) sort: "fail" < "success"
  private val tie = (e: LoginEvent) => if (e.loginState == "fail") 0L else 1L
  private val twoFails =
    Seq.fill(2)((e: LoginEvent) => e.loginState == "fail")

  test("2-step strict pattern reproduces the dedicated login-fail NFA") {
    val generic = Cep
      .strictBatch[LoginEvent](logins, _.userId, _.timestamp, tie, twoFails, windowSec = 2)
      .collect()
      .map(m => (m.key, m.firstTs, m.lastTs))
      .toSet
    val dedicated = LoginFailDetector.eagerBatch(logins, windowSec = 2)
      .collect()
      .map(w => (w.userId, w.firstFailTime, w.lastFailTime))
      .toSet
    assert(generic === dedicated)
    assert(generic.nonEmpty)
  }

  test("3-step pattern: every match is consecutive, ordered, and in-window") {
    import spark.implicits._
    // view -> click -> purchase over the events table (the e_funnel_strict
    // catalog query's shape), checked structurally against a lag oracle
    val evs = graft.sources.Tables.events(spark, "/root/testdata/sf0.001")
      .select($"event_id", $"user_id", $"event_type", $"ts_sec")
      .as[(Long, Long, String, Long)]
    val pattern = Seq("view", "click", "purchase")
      .map(t => (e: (Long, Long, String, Long)) => e._3 == t)
    val got = Cep
      .strictBatch[(Long, Long, String, Long)](evs, _._2, _._4, _._1, pattern, 86400L)
      .collect()
      .map(m => (m.key, m.firstTs, m.lastTs))
      .toSet

    evs.toDF("event_id", "user_id", "event_type", "ts_sec").createOrReplaceTempView("ev")
    val oracle = spark.sql("""
      SELECT user_id, s2, ts_sec FROM (
        SELECT user_id, event_type, ts_sec,
               lag(event_type, 2) OVER w AS t2, lag(ts_sec, 2) OVER w AS s2,
               lag(event_type, 1) OVER w AS t1
        FROM ev
        WINDOW w AS (PARTITION BY user_id ORDER BY ts_sec, event_id))
      WHERE t2 = 'view' AND t1 = 'click' AND event_type = 'purchase'
        AND ts_sec - s2 <= 86400
    """).collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got === oracle)
    assert(got.nonEmpty)
  }

  test("streaming strict pattern matches batch across micro-batches") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    implicit val bufEnc =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[LoginEvent]]()

    val all = logins.collect().sortBy(_.timestamp)
    var cut = all.length / 2
    while (cut < all.length && all(cut - 1).timestamp >= all(cut).timestamp) cut += 1
    val (h1, h2) = all.splitAt(cut)

    val mem = MemoryStream[LoginEvent]
    val withTime = mem.toDS()
      .withColumn("eventTime", timestamp_seconds(col("timestamp")))
      .withWatermark("eventTime", "0 seconds")
      .as[LoginEvent]
    val query = Cep
      .strictStreaming[LoginEvent](withTime, _.userId, _.timestamp, tie, twoFails, windowSec = 2)
      .writeStream
      .format("memory")
      .queryName("cep_matches")
      .outputMode("append")
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("ckpt-cep").toString)
      .start()
    try {
      mem.addData(h1.toSeq)
      query.processAllAvailable()
      mem.addData(h2.toSeq)
      query.processAllAvailable()
      val streamed = spark.table("cep_matches").as[Cep.SeqMatch].collect().toSet
      val batch = Cep
        .strictBatch[LoginEvent](logins, _.userId, _.timestamp, tie, twoFails, windowSec = 2)
        .collect().toSet
      assert(streamed === batch)
    } finally query.stop()
  }

  // ---- relaxed contiguity (followedBy) + timeout side channel ----

  private lazy val orders =
    graft.sources.Fixtures.orders(spark, s"$refBase/OrderPayDetect/src/main/resources/OrderLog.csv")

  private val orderTie = (e: graft.model.OrderEvent) => if (e.eventType == "create") 0L else 1L
  private val createThenPay = Seq(
    (e: graft.model.OrderEvent) => e.eventType == "create",
    (e: graft.model.OrderEvent) => e.eventType == "pay")

  test("followedBy reproduces the order-pay channels (parity with the dedicated detector)") {
    val generic = Cep
      .followedByBatch[graft.model.OrderEvent](
        orders, _.orderId, _.timestamp, orderTie, createThenPay, windowSec = 900)
      .collect()
    val mainKeys = generic.filter(_.channel == Out.Main).map(_.value.key).toSet
    val timeoutKeys = generic.filter(_.channel == Out.Timeout).map(_.value.key).toSet

    val det = OrderPayDetector.batch(orders, timeoutSec = 900).collect()
    val success = det
      .filter(o => o.channel == Out.Main && o.value.resultState == OrderPayDetector.Success)
      .map(_.value.orderId).toSet
    // the CEP view can't see pay-without-create (no run ever opens) —
    // that outcome is the dedicated detector's value-add; everything the
    // reference's CEP job (OrderPayTimeOut.java) distinguishes must agree
    val detTimeout = det
      .filter(o => o.channel == Out.Timeout &&
        o.value.resultState != OrderPayDetector.PayedNoCreate)
      .map(_.value.orderId).toSet

    assert(mainKeys === success)
    assert(timeoutKeys === detTimeout)
    assert(mainKeys.nonEmpty && timeoutKeys.nonEmpty)
    // completed matches carry the full step count, partials fewer
    assert(generic.filter(_.channel == Out.Main).forall(_.value.matched == 2))
    assert(generic.filter(_.channel == Out.Timeout).forall(_.value.matched < 2))
  }

  test("followedBy 3-step: relaxed runs skip intervening events and time out with partials") {
    import spark.implicits._
    type Ev = (Long, Long, String, Long) // id, key, type, ts
    val evs: Seq[Ev] = Seq(
      // key 1: a(10) noise b(20) noise c(30) -> Main despite intervening events
      (1L, 1L, "a", 10L), (2L, 1L, "x", 15L), (3L, 1L, "b", 20L),
      (4L, 1L, "x", 25L), (5L, 1L, "c", 30L),
      // key 2: a(10) b(20), c arrives at 10+100 (deadline) -> Timeout(2)
      (6L, 2L, "a", 10L), (7L, 2L, "b", 20L), (8L, 2L, "c", 110L),
      // key 3: a(10) only -> Timeout(1) at end of input
      (9L, 3L, "a", 10L),
    )
    val steps = Seq("a", "b", "c").map(t => (e: Ev) => e._3 == t)
    val got = Cep
      .followedByBatch[Ev](
        spark.createDataset[(Long, Long, String, Long)](evs.toIndexedSeq), _._2, _._4, _._1,
        steps, 100L)
      .collect()
      .map(o => (o.value.key, o.channel, o.value.matched, o.value.firstTs, o.value.lastTs))
      .toSet
    assert(got === Set(
      (1L, Out.Main, 3, 10L, 30L),
      (2L, Out.Timeout, 2, 10L, 20L),
      (3L, Out.Timeout, 1, 10L, 10L)))
  }

  test("streaming followedBy matches batch across micro-batches (incl. timeout channel)") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext

    val all = orders.collect().sortBy(e => (e.timestamp, orderTie(e)))
    var cut = all.length / 2
    while (cut < all.length && all(cut - 1).timestamp >= all(cut).timestamp) cut += 1
    val (h1, h2) = all.splitAt(cut)

    val mem = MemoryStream[graft.model.OrderEvent]
    val withTime = mem.toDS()
      .withColumn("eventTime", timestamp_seconds(col("timestamp")))
      .withWatermark("eventTime", "0 seconds")
      .as[graft.model.OrderEvent]
    val query = Cep
      .followedByStreaming[graft.model.OrderEvent](
        withTime, _.orderId, _.timestamp, orderTie, createThenPay, windowSec = 900)
      .writeStream
      .format("memory")
      .queryName("cep_followed")
      .outputMode("append")
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("ckpt-cep-fb").toString)
      .start()
    try {
      mem.addData(h1.toSeq)
      query.processAllAvailable()
      mem.addData(h2.toSeq)
      query.processAllAvailable()
      // push the watermark past every open deadline so streaming emits the
      // same end-of-input timeouts the batch fold emits
      mem.addData(Seq(graft.model.OrderEvent(-1L, "noop", "", all.last.timestamp + 10000L)))
      query.processAllAvailable()
      mem.addData(Seq.empty[graft.model.OrderEvent])
      query.processAllAvailable()

      val streamed = spark.table("cep_followed").as[Out[Cep.FollowedMatch]].collect()
        .map(o => (o.channel, o.value)).toSet
      val batch = Cep
        .followedByBatch[graft.model.OrderEvent](
          orders, _.orderId, _.timestamp, orderTie, createThenPay, windowSec = 900)
        .collect()
        .map(o => (o.channel, o.value)).toSet
      assert(streamed === batch)
      assert(streamed.exists(_._1 == Out.Timeout) && streamed.exists(_._1 == Out.Main))
    } finally query.stop()
  }
}
