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
}
