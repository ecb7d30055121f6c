package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Row shape for the transition-stream parity test (top-level so the
  * MemoryStream encoder derives).
  */
final case class TransEv(user_id: Long, ts_sec: Long, event_id: Long, item: Long)

/** Row shape for the attribution-stream parity test. */
final case class AttribEv(
    event_id: Long, user_id: Long, event_type: String,
    ts_sec: Long, item: Long, cents: Long)

/** Streaming item-transition edges: live parity with the batch edge list
  * when micro-batch boundaries respect event-time order.
  */
class TransitionStreamSpec extends SparkSpec {

  test("transitionStream edges aggregate to the batch transitionEdges counts") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val evs = graft.sources.Tables.events(spark, "/root/testdata/sf0.001")
      .withColumn("item", regexp_extract($"props", "(\\d+)", 1).cast("long"))
      .filter($"item".isNotNull)
      .select($"user_id", $"ts_sec", $"event_id", $"item")

    val rows = evs.as[TransEv].collect().sortBy(e => (e.ts_sec, e.event_id))

    val mem = MemoryStream[TransEv]
    val got = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long)]
    val q = Streams.transitionStream(mem.toDF())
      .writeStream
      .outputMode("append")
      .foreachBatch { (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        b.collect().foreach { r =>
          got.synchronized {
            got += ((r.getAs[Long]("user_id"), r.getAs[Long]("src"), r.getAs[Long]("dst")))
          }
        }
        ()
      }
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("ckpt-trans").toString)
      .start()
    try {
      // three time-ordered chunks: edges must also form ACROSS batch
      // boundaries (carried per-user state), not just within them
      rows.grouped(math.max(1, rows.length / 3 + 1)).foreach { chunk =>
        mem.addData(chunk.toSeq)
        q.processAllAvailable()
      }
    } finally q.stop()

    val streamed = got.groupBy(e => (e._2, e._3)).view.mapValues(_.size.toLong).toMap
    val batch = graft.queries.GraphOps.transitionEdges(evs)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(streamed === batch)
    // cross-batch formation actually happened: more edges than any one
    // batch could produce alone requires carried state (first chunk has
    // at most chunkSize-1 in-chunk edges per user)
    assert(got.nonEmpty)
  }

  test("stateful chain: windowed edge counts on top of transitionStream (live Markov input)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val evs = graft.sources.Tables.events(spark, "/root/testdata/sf0.001")
      .withColumn("item", regexp_extract($"props", "(\\d+)", 1).cast("long"))
      .filter($"item".isNotNull)
      .select($"user_id", $"ts_sec", $"event_id", $"item")
    val rows = evs.as[TransEv].collect().sortBy(e => (e.ts_sec, e.event_id))

    val mem = MemoryStream[TransEv]
    val latest = scala.collection.mutable.Map.empty[(Long, Long, Long), Long]
    // second stateful stage: tumbling 6h windows over the EDGE stream —
    // watermark re-attached to the emitted event time (the documented
    // append-mode chaining pattern)
    val q = Streams.transitionStream(mem.toDF())
      .withColumn("event_time", timestamp_seconds($"ts_sec"))
      .withWatermark("event_time", "10 seconds")
      .groupBy(window($"event_time", "6 hours"), $"src", $"dst")
      .agg(count(lit(1)).as("cnt"))
      .select(unix_timestamp($"window.start").as("ws"), $"src", $"dst", $"cnt")
      .writeStream
      .outputMode("update")
      .foreachBatch { (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        b.collect().foreach { r =>
          latest.synchronized {
            latest((r.getAs[Long]("ws"), r.getAs[Long]("src"), r.getAs[Long]("dst"))) =
              r.getAs[Long]("cnt")
          }
        }
        ()
      }
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("ckpt-trans-win").toString)
      .start()
    try {
      rows.grouped(math.max(1, rows.length / 3 + 1)).foreach { chunk =>
        mem.addData(chunk.toSeq)
        q.processAllAvailable()
      }
    } finally q.stop()

    // batch equivalent: edges at event grain, windowed the same way
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"user_id").orderBy($"ts_sec", $"event_id")
    val batch = evs
      .withColumn("nxt", lead($"item", 1).over(w))
      .withColumn("nxt_ts", lead($"ts_sec", 1).over(w))
      .filter($"nxt".isNotNull && $"nxt" =!= $"item")
      .groupBy(expr("(nxt_ts div 21600) * 21600").as("ws"), $"item".as("src"), $"nxt".as("dst"))
      .agg(count(lit(1)).as("cnt"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)) -> r.getLong(3)).toMap
    assert(latest.toMap === batch)
  }

  test("attributionStream credits aggregate to the batch e_attribution rows") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val evs = graft.sources.Tables.events(spark, "/root/testdata/sf0.001")
      .filter($"event_type".isin("view", "purchase"))
      .withColumn("item",
        coalesce(regexp_extract($"props", "(\\d+)", 1).cast("long"), lit(-1L)))
      .select($"event_id", $"user_id", $"event_type", $"ts_sec", $"item",
        floor($"value" * 100).cast("long").as("cents"))
      .as[AttribEv].collect().sortBy(e => (e.ts_sec, e.event_id))

    val mem = MemoryStream[AttribEv]
    val got = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
    val q = Streams.attributionStream(mem.toDF())
      .writeStream
      .outputMode("append")
      .foreachBatch { (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        b.collect().foreach { r =>
          got.synchronized { got += ((r.getAs[Long]("item"), r.getAs[Long]("cents"))) }
        }
        ()
      }
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("ckpt-attrib").toString)
      .start()
    try {
      evs.grouped(math.max(1, evs.length / 3 + 1)).foreach { chunk =>
        mem.addData(chunk.toSeq)
        q.processAllAvailable()
      }
    } finally q.stop()

    val streamed = got.groupBy(_._1).view
      .mapValues(g => (g.size.toLong, g.map(_._2).sum)).toMap
    val batch = graft.queries.Catalog.queries("e_attribution")(spark, "/root/testdata/sf0.001")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(streamed === batch)
  }

  test("attributionStream late view: no retro credit, but future purchases see it") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[AttribEv]
    val got = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long)]
    val q = Streams.attributionStream(mem.toDF())
      .writeStream.outputMode("append")
      .foreachBatch { (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        b.collect().foreach { r =>
          got.synchronized {
            got += ((r.getAs[Long]("purchase_id"), r.getAs[Long]("item"), r.getAs[Long]("cents")))
          }
        }
        ()
      }
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("ckpt-attrib-late").toString)
      .start()
    try {
      // batch 1: a purchase with no view yet -> unattributed (-1)
      mem.addData(AttribEv(10L, 1L, "purchase", 100L, -1L, 500L))
      q.processAllAvailable()
      // batch 2: a LATE view (ts=50, before the already-credited purchase)
      // plus a purchase after it -> the late view must credit the NEW
      // purchase (carried state, not ahead of it) but never retro-credit
      mem.addData(AttribEv(11L, 1L, "view", 50L, 7L, 0L))
      mem.addData(AttribEv(12L, 1L, "purchase", 200L, -1L, 300L))
      q.processAllAvailable()
      // batch 3: a FUTURE view (ts=1000) then a late purchase at 900 ->
      // the 16-byte state holds only the NEWEST view, which is ahead of
      // the purchase and guarded out; older views are gone from state,
      // so the purchase lands unattributed — the documented single-slot
      // trade (same contract as the streaming as-of): the future never
      // leaks, at the price of late probes behind a newer build
      mem.addData(AttribEv(13L, 1L, "view", 1000L, 9L, 0L))
      q.processAllAvailable()
      mem.addData(AttribEv(14L, 1L, "purchase", 900L, -1L, 200L))
      q.processAllAvailable()
    } finally q.stop()
    assert(got.toList === List(
      (10L, -1L, 500L), // nothing to credit yet
      (12L, 7L, 300L),  // late view credits the later purchase
      (14L, -1L, 200L), // future view never leaks backward; old view evicted
    ))
  }
}
