package graft.operators

import graft.SparkSpec

/** As-of enrichment semantics at the boundaries the oracle pins: same-ts
  * inclusion, deterministic tie-break, left-outer nulls — plus the
  * plan property that makes it scale (no join operator at all).
  */
class AsOfSpec extends SparkSpec {

  type Ev = (Long, Long, String, Long) // id, key, type, ts
  type Ev5 = (Long, Long, String, Long, java.sql.Timestamp) // + watermark col

  private def run(evs: Seq[Ev]) = {
    import spark.implicits._
    val out = AsOf.lastAtOrBefore[Ev](
      spark.createDataset(evs.toIndexedSeq), _._2, _._4, _._1, _._3 == "p")
      .collect()
      .map(m => (m.key, m.probeId, m.matchId, m.matchTs))
    // exactly one emission per probe (a Set comparison would hide dupes)
    assert(out.length === evs.count(_._3 == "p"))
    out.toSet
  }

  test("boundary semantics: at-or-before, max-id tie, left-outer nulls") {
    val got = run(Seq(
      (1L, 1L, "v", 10L), (2L, 1L, "p", 20L), // plain before
      (3L, 2L, "v", 30L), (4L, 2L, "p", 30L), // same ts: view matches
      (5L, 3L, "v", 40L), (6L, 3L, "v", 40L), (7L, 3L, "p", 41L), // tie: max id wins
      (8L, 4L, "p", 50L), (9L, 4L, "v", 60L), // view only AFTER: null
      (10L, 5L, "v", 70L), (11L, 5L, "p", 71L), (12L, 5L, "p", 72L), // shared build
    ))
    assert(got === Set(
      (1L, 2L, Some(1L), Some(10L)),
      (2L, 4L, Some(3L), Some(30L)),
      (3L, 7L, Some(6L), Some(40L)),
      (4L, 8L, None, None),
      (5L, 11L, Some(10L), Some(70L)),
      (5L, 12L, Some(10L), Some(70L))))
  }

  test("streaming as-of matches batch across micro-batches") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext

    val rnd = new scala.util.Random(31)
    var t = 0L
    val evs: Vector[Ev] = Vector.tabulate(600) { i =>
      t += rnd.nextInt(3)
      (i.toLong, rnd.nextInt(10).toLong + 1L, if (rnd.nextBoolean()) "v" else "p", t)
    }
    // split at a strict ts boundary (the ascending-watermark regime)
    var cut = evs.length / 2
    while (cut < evs.length && evs(cut - 1)._4 >= evs(cut)._4) cut += 1
    val (h1, h2) = evs.splitAt(cut)

    val mem = MemoryStream[Ev]
    val q = AsOf.lastAtOrBeforeStreaming[Ev](mem.toDS(), _._2, _._4, _._1, _._3 == "p")
      .writeStream.format("memory").queryName("asof_stream").outputMode("append")
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("ckpt-asof").toString)
      .start()
    try {
      mem.addData(h1); q.processAllAvailable()
      mem.addData(h2); q.processAllAvailable()
      // late cross-batch probes exercising the no-future guard, with the
      // blocking build carried from an EARLIER batch (same-batch nulls
      // would pass even without the guard):
      //   key 999 — only a future build is visible: null match;
      //   key 998 — a future carried build PLUS an older build in the
      //   probe's own batch: the older build must match (the guard must
      //   not blind the probe to at-or-before builds it folded with)
      mem.addData(Seq((9999L, 999L, "v", t + 100), (9997L, 998L, "v", t + 100)))
      q.processAllAvailable()
      mem.addData(Seq((9998L, 999L, "p", 1L), (9996L, 998L, "v", 1L), (9995L, 998L, "p", 2L)))
      q.processAllAvailable()
      val all = spark.table("asof_stream").as[AsOf.AsOfMatch].collect()
      // exactly one emission per probe — Sets would hide duplicates
      assert(all.length === evs.count(_._3 == "p") + 2)
      assert(all.forall(m => m.matchTs.forall(_ <= m.probeTs)), "future leak")
      assert(all.find(_.probeId == 9998L).get.matchId.isEmpty)
      assert(all.find(_.probeId == 9995L).get.matchId === Some(9996L))
      val streamed = all.filter(m => m.key != 999L && m.key != 998L).toSet
      val batch = run(evs).map { case (k, pid, mid, mts) =>
        AsOf.AsOfMatch(k, pid, evs(pid.toInt)._4, mid, mts)
      }
      assert(streamed === batch)
      assert(streamed.exists(_.matchId.isEmpty) && streamed.exists(_.matchId.nonEmpty))
    } finally q.stop()
  }

  test("maxAgeSec retention: carried state expires at the horizon, probes after it match null") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, timestamp_seconds}
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext

    val mem = MemoryStream[Ev]
    // EventTimeTimeout needs a watermark on the input stream
    val ds = mem.toDS()
      .withColumn("ets", timestamp_seconds(col("_4")))
      .withWatermark("ets", "0 seconds")
      .as[Ev5]
    val q = AsOf.lastAtOrBeforeStreaming[Ev5](
      ds, _._2, _._4, _._1, _._3 == "p", maxAgeSec = Some(10L))
      .writeStream.format("memory").queryName("asof_ttl").outputMode("append")
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("ckpt-asof-ttl").toString)
      .start()
    try {
      // b1: key 1 gets a build at ts=100 (expiry horizon 110)
      mem.addData(Seq((1L, 1L, "v", 100L))); q.processAllAvailable()
      // b2: a probe INSIDE the horizon matches; watermark advances to 105
      mem.addData(Seq((2L, 1L, "p", 105L))); q.processAllAvailable()
      // b3: unrelated key pushes the watermark to 200, past the horizon
      mem.addData(Seq((3L, 2L, "v", 200L))); q.processAllAvailable()
      // b4: key 1 has no data while the timeout fires — state is removed
      mem.addData(Seq((4L, 2L, "v", 201L))); q.processAllAvailable()
      // b5: a later probe for key 1 now sees NO carried build: null match
      mem.addData(Seq((5L, 1L, "p", 300L))); q.processAllAvailable()
      val out = spark.table("asof_ttl").as[AsOf.AsOfMatch].collect()
      assert(out.find(_.probeId == 2L).get.matchId === Some(1L),
        "a probe before the horizon must still match the carried build")
      assert(out.find(_.probeId == 5L).get.matchId.isEmpty,
        "after expiry the carried build must be gone — bounded retention")
    } finally q.stop()
  }

  test("the plan has no join operator: one shuffle, carry-forward scan") {
    import spark.implicits._
    val evs = graft.sources.Tables.events(spark, "/root/testdata/sf0.001")
      .filter($"event_type".isin("view", "purchase"))
      .select($"event_id", $"user_id", $"event_type", $"ts_sec")
      .as[Ev]
    val plan = AsOf.lastAtOrBefore[Ev](evs, _._2, _._4, _._1, _._3 == "p")
      .queryExecution.sparkPlan.toString
    assert(!plan.contains("Join"), plan)
    assert("Exchange".r.findAllIn(plan).size === 1, plan)
  }
}
