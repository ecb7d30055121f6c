package graft.streaming

import graft.SparkSpec
import graft.queries.{Catalog, EventAnalytics}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** The standing trending counts must be the batch score's exact
  * sufficient statistic: scoring the streamed per-(item, day) counts
  * reproduces `e_trending_decay` bit-for-bit, at every cut-off.
  */
class TrendingStreamSpec extends SparkSpec {

  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  private def score(counts: Map[(Long, Long), Long]): Seq[(Long, Long)] = {
    val df = counts.toSeq.map { case ((item, day), cnt) => (item, day, cnt) }
      .toDF("item", "day", "cnt")
    EventAnalytics.trendingScoreOf(df)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
  }

  test("streamed day counts score to e_trending_decay exactly, at every cut-off") {
    implicit val sqlCtx = spark.sqlContext
    val evs = graft.sources.Tables.events(spark, sf)
      .select($"ts_sec", $"props")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    val (h1, h2) = evs.splitAt(evs.length / 2)

    val mem = MemoryStream[(Long, String)]
    val counts = scala.collection.mutable.Map.empty[(Long, Long), Long]
    val q = Streams.trendingDayCountsStream(mem.toDF().toDF("ts_sec", "props"))
      .writeStream
      .outputMode("update")
      .foreachBatch { (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        counts.synchronized {
          b.collect().foreach { r =>
            counts((r.getLong(0), r.getLong(1))) = r.getLong(2)
          }
        }
        ()
      }
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("ckpt-trend").toString)
      .start()
    try {
      mem.addData(h1)
      q.processAllAvailable()
      val mid = EventAnalytics.trendingScoreOf(
        EventAnalytics.trendingDayCountsOn(
          h1.toDF("ts_sec", "props")))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
      assert(score(counts.toMap) === mid,
        "mid-stream the streamed counts score exactly the events seen so far")
      mem.addData(h2)
      q.processAllAvailable()
      val fin = Catalog.queries("e_trending_decay")(spark, sf)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
      assert(score(counts.toMap) === fin,
        "at end-of-stream the streamed counts reproduce e_trending_decay verbatim")
    } finally q.stop()
  }

  test("bounded variant: state evicts past 63 half-lives, score unchanged, late zero-weight drops are free") {
    implicit val sqlCtx = spark.sqlContext
    // corpus spanning FAR past 63 half-lives (441 days): old buckets'
    // weights are exactly 0 at the recent head
    def ev(day: Long, item: Long) = (day * 86400L + 17L, s"item=$item")
    val oldRows = for (d <- 0L until 10L; i <- 1L to 2L) yield ev(d, i)
    val recentRows = for (d <- 495L until 500L; i <- 1L to 3L) yield ev(d, i)
    val lateZero = Seq(ev(5L, 1L)) // arrives after the watermark passed it

    val mem = MemoryStream[(Long, String)]
    val counts = scala.collection.mutable.Map.empty[(Long, Long), Long]
    var stateRows = -1L
    val q = Streams.trendingDayCountsStreamBounded(
        mem.toDF().toDF("ts_sec", "props"))
      .writeStream
      .outputMode("update")
      .foreachBatch { (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        counts.synchronized {
          b.collect().foreach { r =>
            counts((r.getLong(0), r.getLong(1))) = r.getLong(2)
          }
        }
        ()
      }
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("ckpt-trend-bnd").toString)
      .start()
    try {
      mem.addData(oldRows)
      q.processAllAvailable()
      mem.addData(recentRows) // head jumps to day 499: watermark passes the old buckets
      q.processAllAvailable()
      mem.addData(lateZero)   // eviction takes effect; the late event is dropped
      q.processAllAvailable()
      stateRows = q.lastProgress.stateOperators.head.numRowsTotal
    } finally q.stop()

    val allDelivered = (oldRows ++ recentRows ++ lateZero).toDF("ts_sec", "props")
    val batchScore = EventAnalytics.trendingScoreOf(
      EventAnalytics.trendingDayCountsOn(allDelivered))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(score(counts.toMap) === batchScore,
      "bounded stream == batch over EVERYTHING delivered, dropped zero-weight late event included")

    val totalBuckets = (oldRows ++ recentRows).map { case (t, p) => (p, t / 86400L) }.distinct.size
    assert(stateRows < totalBuckets,
      s"state must evict the zero-weight buckets ($stateRows vs $totalBuckets observed)")
    assert(stateRows === recentRows.map { case (t, p) => (p, t / 86400L) }.distinct.size,
      "surviving state is exactly the in-horizon buckets")
    // the dropped late event never surfaced as a count update
    assert(counts((1L, 5L)) === 1L, "day-5 bucket kept its pre-drop count")
  }

  test("bounded variant buckets pre-epoch timestamps exactly like the batch twin") {
    implicit val sqlCtx = spark.sqlContext
    // negative ts_sec: Spark's `div` truncates toward zero while a raw
    // 1-day window FLOORS — the bounded twin must bucket through the
    // exact twin's arithmetic (-1 -> day 0, -90000 -> day -1)
    val weird = Seq((-90000L, "item=1"), (-1L, "item=1"), (5L, "item=2"))
    val mem = MemoryStream[(Long, String)]
    val counts = scala.collection.mutable.Map.empty[(Long, Long), Long]
    val q = Streams.trendingDayCountsStreamBounded(
        mem.toDF().toDF("ts_sec", "props"))
      .writeStream
      .outputMode("update")
      .foreachBatch { (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        counts.synchronized {
          b.collect().foreach { r =>
            counts((r.getLong(0), r.getLong(1))) = r.getLong(2)
          }
        }
        ()
      }
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("ckpt-trend-neg").toString)
      .start()
    try {
      mem.addData(weird)
      q.processAllAvailable()
    } finally q.stop()
    val batch = EventAnalytics.trendingDayCountsOn(weird.toDF("ts_sec", "props"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    // ts_sec = -1 is the truncation-vs-floor trap: the div-bucketing
    // keeps it in day 0 exactly like the batch twin (a raw 1-day
    // window would floor it into day -1 and then drop it outright)
    assert(batch((1L, 0L)) === 1L && counts.toMap.get((1L, 0L)) === Some(1L),
      "the [-86399, -1] boundary must bucket into day 0 like the batch twin")
    // strictly negative DAYS are outside the variant's parity domain:
    // Spark floors the initial watermark at epoch 0, so their windows
    // are late-on-arrival under any delay — documented, and exactly
    // the only divergence from the batch twin
    assert(batch((1L, -1L)) === 1L && !counts.contains((1L, -1L)),
      "day<0 is the documented watermark-floor domain edge")
    assert(counts.toMap === (batch - ((1L, -1L))),
      "everything from day 0 up matches the batch twin bucket for bucket")
  }
}
