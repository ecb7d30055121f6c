package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.model._

/** The reference's windowed-statistics jobs as reusable Dataset operators
  * (SURVEY §2.4-2.6): hot items, hot pages, PV, UV (exact + approx),
  * marketing by channel / totals, ad clicks by province.
  *
  * Each operator is a DataFrame→DataFrame function over event-time columns,
  * so the identical code serves batch fixtures and `foreachBatch`/window
  * aggregations in Structured Streaming (the streaming wiring lives in
  * [[graft.streaming.Streams]]).
  *
  * Scale notes: every aggregation is partial→final hash agg (the salting
  * the reference hand-codes in PageView.java:73-88 is subsumed — SURVEY §4);
  * Top-N ranks only the (window, key) aggregate, never raw events, so the
  * rank input is orders of magnitude smaller than the scan.
  */
object Windowed {

  /** Sliding-window count per item + per-window Top-N.
    * HotItems.java:76-85 + TopNHotItems(5) (1 h / 5 min in the reference).
    * Window assignment matches Flink's epoch-aligned sliding windows;
    * `windowEnd` is epoch millis like ItemViewCount.windowEnd.
    */
  def hotItems(
      events: Dataset[UserBehavior],
      topN: Int = 5,
      sizeSec: Long = 3600,
      slideSec: Long = 300,
  ): DataFrame = {
    val counted = events
      .filter(col("behavior") === "pv")
      .withColumn(
        "windowEnd",
        explode(windowEnds(col("timestamp") * 1000, sizeSec * 1000, slideSec * 1000)))
      .groupBy(col("windowEnd"), col("itemId"))
      .agg(count(lit(1)).as("cnt"))
    topNPerWindow(counted, col("itemId"), topN)
  }

  /** Hot pages: GET + non-static-asset URLs, sliding windows, Top-N.
    * HotPages.java:71-85 + TopNHotPages(3) (10 min / 5 s in the reference).
    */
  def hotPages(
      logs: Dataset[ApacheLogEvent],
      topN: Int = 3,
      sizeSec: Long = 600,
      slideSec: Long = 5,
  ): DataFrame = {
    val counted = logs
      .filter(col("method") === "GET")
      .filter(!col("url").rlike("""\.(css|js|png|ico)$"""))
      .withColumn("windowEnd", explode(windowEnds(col("timestamp"), sizeSec * 1000, slideSec * 1000)))
      .groupBy(col("windowEnd"), col("url"))
      .agg(count(lit(1)).as("cnt"))
    topNPerWindow(counted, col("url"), topN)
  }

  /** Tumbling PV count of behavior='pv' (PageView.java:59-70, 1 h windows).
    * The reference's random-salt two-phase variant (:73-88) is deliberately
    * not reproduced: Catalyst's partial aggregation already combines
    * map-side, which is the same fix without the extra shuffle.
    */
  def pageViews(events: Dataset[UserBehavior], sizeSec: Long = 3600): DataFrame =
    events
      .filter(col("behavior") === "pv")
      .groupBy(tumbleEnd(col("timestamp") * 1000, sizeSec * 1000).as("windowEnd"))
      .agg(count(lit(1)).as("count"))

  /** Exact distinct users per tumbling window (UniqueVisitor.java:54-73). */
  def uniqueVisitors(events: Dataset[UserBehavior], sizeSec: Long = 3600): DataFrame =
    events
      .filter(col("behavior") === "pv")
      .groupBy(tumbleEnd(col("timestamp") * 1000, sizeSec * 1000).as("windowEnd"))
      .agg(countDistinct(col("userId")).as("uv"))

  /** Approximate distinct via HLL++ — the Spark-idiomatic stand-in for the
    * reference's 2^29-bit Redis bloom filter (UvWithBloomFilter.java:94-161):
    * bounded memory per window, mergeable across partitions, no external KV.
    */
  def uniqueVisitorsApprox(
      events: Dataset[UserBehavior],
      sizeSec: Long = 3600,
      rsd: Double = 0.01,
  ): DataFrame =
    events
      .filter(col("behavior") === "pv")
      .groupBy(tumbleEnd(col("timestamp") * 1000, sizeSec * 1000).as("windowEnd"))
      .agg(approx_count_distinct(col("userId"), rsd).as("uv"))

  /** Per-(channel, behavior) sliding-window counts, UNINSTALL dropped
    * (AppMarketingByChannel.java:46-56, 1 h / 5 s).
    */
  def marketingByChannel(
      events: Dataset[MarketingUserBehavior],
      sizeSec: Long = 3600,
      slideSec: Long = 5,
  ): DataFrame =
    events
      .filter(col("behavior") =!= "UNINSTALL")
      .withColumn("windowEnd", explode(windowEnds(col("timestamp"), sizeSec * 1000, slideSec * 1000)))
      .groupBy(col("windowEnd"), col("channel"), col("behavior"))
      .agg(count(lit(1)).as("count"))

  /** Global marketing totals (AppMarketingStatistics.java:46-57) — the
    * constant-key ("total") projection collapses to a keyless windowed agg.
    */
  def marketingTotals(
      events: Dataset[MarketingUserBehavior],
      sizeSec: Long = 3600,
      slideSec: Long = 5,
  ): DataFrame =
    events
      .filter(col("behavior") =!= "UNINSTALL")
      .withColumn("windowEnd", explode(windowEnds(col("timestamp"), sizeSec * 1000, slideSec * 1000)))
      .groupBy(col("windowEnd"))
      .agg(count(lit(1)).as("count"))

  /** Per-province sliding-window ad-click counts
    * (AdStatisticsByProvince.java:55-65, 1 h / 5 min); blacklist filtering
    * composes upstream via [[AdBlacklist]].
    */
  def adClicksByProvince(
      clicks: Dataset[AdClickEvent],
      sizeSec: Long = 3600,
      slideSec: Long = 300,
  ): DataFrame =
    clicks
      .withColumn(
        "windowEnd",
        explode(windowEnds(col("timestamp") * 1000, sizeSec * 1000, slideSec * 1000)))
      .groupBy(col("windowEnd"), col("province"))
      .agg(count(lit(1)).as("count"))

  // ----- shared window math -------------------------------------------

  /** Epoch-aligned sliding-window *ends* (millis) containing tsMs — the
    * same assignment Flink's SlidingEventTimeWindows.assignWindows performs
    * and Spark's TimeWindowing rule generates for `window()`.
    */
  def windowEnds(tsMs: Column, sizeMs: Long, slideMs: Long): Column = {
    val lastStart = tsMs - pmod(tsMs, lit(slideMs))
    transform(
      sequence(lastStart - sizeMs + slideMs, lastStart, lit(slideMs)),
      start => start + lit(sizeMs))
  }

  /** Epoch-aligned tumbling-window end (millis) for tsMs. */
  def tumbleEnd(tsMs: Column, sizeMs: Long): Column =
    tsMs - pmod(tsMs, lit(sizeMs)) + lit(sizeMs)

  /** Top-N rows per windowEnd by count desc (deterministic tiebreak on the
    * key) — the TopNHotItems/TopNHotPages shape as a ranking window over the
    * aggregate.
    */
  def topNPerWindow(counted: DataFrame, key: Column, topN: Int): DataFrame = {
    val w = Window.partitionBy(col("windowEnd")).orderBy(col("cnt").desc, key)
    counted
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= topN)
  }
}
