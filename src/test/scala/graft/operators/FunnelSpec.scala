package graft.operators

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The counting relaxed-funnel operator, cross-checked against the
  * enumerate-then-count join formulation it replaced (which is kept here,
  * in test code only, as the semantic oracle) and a brute-force triple
  * enumerator on adversarial small inputs.
  */
class FunnelSpec extends SparkSpec {

  private val W = 86400L

  private type Ev = (Long, Long, String, Long) // event_id, user_id, type, ts

  private def countingResult(evs: Seq[Ev]): Map[Long, Long] = {
    import spark.implicits._
    Funnel
      .countTriplesBatch[Ev](
        spark.createDataset(evs.toIndexedSeq), _._2, _._4, _._1,
        _._3 == "view", _._3 == "click", _._3 == "purchase", W)
      .collect()
      .map(kc => kc.key -> kc.triples)
      .toMap
  }

  /** O(n^3) reference enumerator — the definition, verbatim. */
  private def bruteForce(evs: Seq[Ev]): Map[Long, Long] = {
    def after(a: Ev, b: Ev) = b._4 > a._4 || (b._4 == a._4 && b._1 > a._1)
    val triples = for {
      v <- evs if v._3 == "view"
      c <- evs if c._3 == "click" && c._2 == v._2 && after(v, c)
      p <- evs if p._3 == "purchase" && p._2 == v._2 && after(c, p) && p._4 - v._4 <= W
    } yield v._2
    triples.groupBy(identity).map { case (u, ts) => u -> ts.size.toLong }
  }

  test("counting scan equals brute force on adversarial orderings") {
    // same-second ties, interleaved users, out-of-window purchases, an
    // event stream where views/clicks/purchases alternate
    val evs: Seq[Ev] = Seq(
      (1L, 7L, "view", 100L), (2L, 7L, "click", 100L), (3L, 7L, "purchase", 100L),
      (4L, 7L, "view", 100L), (5L, 7L, "click", 101L), (6L, 7L, "purchase", 102L),
      (7L, 7L, "view", 90000L), (8L, 7L, "click", 90001L), (9L, 7L, "purchase", 200000L),
      (10L, 8L, "purchase", 50L), (11L, 8L, "click", 60L), (12L, 8L, "view", 70L),
      (13L, 8L, "click", 80L), (14L, 8L, "purchase", 90L),
      (15L, 9L, "view", 10L), (16L, 9L, "view", 20L), (17L, 9L, "click", 30L),
      (18L, 9L, "click", 40L), (19L, 9L, "purchase", 50L), (20L, 9L, "purchase", 86420L),
    )
    assert(countingResult(evs) === bruteForce(evs))
  }

  test("counting scan equals brute force on random event soups") {
    val rnd = new scala.util.Random(42)
    val types = Vector("view", "click", "purchase", "noop")
    (1 to 5).foreach { _ =>
      val evs: Seq[Ev] = (1 to 300).map { i =>
        (i.toLong, rnd.nextInt(5).toLong, types(rnd.nextInt(4)), rnd.nextLong(2 * W))
      }
      val relevant = evs.filter(e => e._3 != "noop")
      assert(countingResult(relevant) === bruteForce(evs))
    }
  }

  test("counting scan equals the join formulation on the sf0.001 events table") {
    import spark.implicits._
    val base = graft.sources.Tables.events(spark, "/root/testdata/sf0.001")
      .select($"event_id", $"user_id", $"event_type", $"ts_sec")
    def leg(t: String, a: String) = base
      .filter($"event_type" === t)
      .select($"user_id".as(s"${a}_uid"), $"ts_sec".as(s"${a}_sec"), $"event_id".as(s"${a}_id"))
    def after(a: String, b: String) =
      (col(s"${b}_sec") > col(s"${a}_sec")) ||
        (col(s"${b}_sec") === col(s"${a}_sec") && col(s"${b}_id") > col(s"${a}_id"))
    val joined = leg("view", "v")
      .join(leg("click", "c"), col("c_uid") === col("v_uid") && after("v", "c"))
      .join(leg("purchase", "p"),
        col("p_uid") === col("v_uid") && after("c", "p") &&
          col("p_sec") - col("v_sec") <= W)
      .groupBy(col("v_uid").as("user_id"))
      .agg(count(lit(1)).as("triples"))
      .collect()
      .map(r => r.getLong(0) -> r.getLong(1))
      .toMap

    val counted = graft.queries.EventAnalytics.funnelRelaxed
      .spark(spark, "/root/testdata/sf0.001")
      .collect()
      .map(r => r.getLong(0) -> r.getLong(1))
      .toMap

    assert(counted === joined)
    assert(counted.nonEmpty)
  }

  test("hot-key cost is additive, not multiplicative: one bot user, closed form") {
    // n views, then n clicks, then n purchases, all within one window.
    // The join formulation materializes n^3 triples; the scan returns the
    // closed-form n^2 * n without enumerating any — instant at n where
    // the join would already materialize 10^9 rows.
    val n = 1000L
    val evs: Seq[Ev] =
      (1L to n).map(i => (i, 1L, "view", 100L + i / 100)) ++
        (1L to n).map(i => (n + i, 1L, "click", 200L + i / 100)) ++
        (1L to n).map(i => (2 * n + i, 1L, "purchase", 300L + i / 100))
    assert(countingResult(evs) === Map(1L -> n * n * n))
  }

  test("e_funnel_relaxed plan contains no join (one shuffle, scan-side)") {
    val df = graft.queries.EventAnalytics.funnelRelaxed.spark(spark, "/root/testdata/sf0.001")
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.toLowerCase.contains("join"), s"expected join-free plan, got:\n$plan")
  }

  test("streaming counting funnel converges to the batch scan (update mode)") {
    import spark.implicits._
    val evs = graft.sources.Tables.events(spark, "/root/testdata/sf0.001")
      .filter($"event_type".isin("view", "click", "purchase"))
      .select($"event_id", $"user_id", $"event_type", $"ts_sec")
      .as[graft.streaming.FunnelEv]
      .collect()
      .sortBy(e => (e.ts_sec, e.event_id))

    implicit val sq = spark.sqlContext
    val mem = MemoryStream[graft.streaming.FunnelEv]
    val latest = scala.collection.mutable.Map.empty[Long, Long]
    val src = mem.toDS()
      .withColumn("eventTime", timestamp_seconds(col("ts_sec")))
      .withWatermark("eventTime", "0 seconds")
      .as[graft.streaming.FunnelEv]
    val q = Funnel
      .countStreaming[graft.streaming.FunnelEv](
        src, _.user_id, _.ts_sec, _.event_id,
        _.event_type == "view", _.event_type == "click", _.event_type == "purchase", W)
      .writeStream
      .outputMode("update")
      .foreachBatch { (b: org.apache.spark.sql.Dataset[Funnel.KeyCount], _: Long) =>
        b.collect().foreach { kc => latest.synchronized { latest(kc.key) = kc.triples } }
        ()
      }
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("ckpt-funnel-count").toString)
      .start()
    try {
      // cut where ts strictly increases: FMGWS + EventTimeTimeout drops
      // rows whose event time TIES the watermark left by the prior batch
      var cut = evs.length / 2
      while (cut < evs.length && evs(cut).ts_sec == evs(cut - 1).ts_sec) cut += 1
      val (h1, h2) = evs.splitAt(cut)
      mem.addData(h1.toSeq)
      q.processAllAvailable()
      mem.addData(h2.toSeq)
      q.processAllAvailable()
    } finally q.stop()

    val batch = countingResult(evs.map(e => (e.event_id, e.user_id, e.event_type, e.ts_sec)).toSeq)
    assert(latest.toMap === batch)
    assert(latest.nonEmpty)
  }
}
