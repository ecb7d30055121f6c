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
}
