package graft.streaming

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.GraftSession
import graft.sources.Tables

/** Streaming-throughput probe: replays the `events` table (optionally
  * replicated with disjoint event ids) as a file stream and drives the
  * sliding-window hot-items aggregation to completion with
  * `Trigger.AvailableNow`, printing one JSON line with rows/sec.
  *
  * This is the apples-to-apples number against the reference's anecdote
  * (480k UserBehavior rows through a single-JVM Flink job, README "48w条")
  * — same shape of work: parse → event time → sliding windowed count →
  * per-window rank in the sink.
  *
  * Usage: `sbt "runMain graft.streaming.StreamBench [sfDir] [replicas]"`.
  * Bounded micro-batches via maxFilesPerTrigger keep per-batch state
  * realistic rather than one mega-batch. Runs on
  * [[GraftSession.streamingBuilder]] — the RocksDB state store — so the
  * published rows/sec measures the configuration documented as the scale
  * path, not the heap-backed default.
  */
object StreamBench {

  /** Probe-4 event row. A case class, not a tuple: the product encoder
    * maps by NAME and tolerates the extra watermark column, while a
    * Tuple4 deserializer requires an exact field-count match and fails
    * analysis once `eventTime` is appended.
    */
  final case class VcEv(event_id: Long, user_id: Long, event_type: String, ts_sec: Long)

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val replicas = args.lift(1).map(_.toInt).getOrElse(5)
    val spark = GraftSession
      .streamingBuilder("graft-stream-bench", sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    // stage: events replicated with shifted ids (same timestamps — denser
    // windows, like real traffic growth) as replayable CSV chunks
    val base = Tables
      .events(spark, sfDir)
      .withColumn("item", regexp_extract(col("props"), "(\\d+)", 1).cast("long"))
      .select($"event_id", $"user_id", $"event_type", $"item", $"ts_sec")
    // one job for every scalar the staging needs (a second scan per
    // aggregate would re-run the parquet read + regexp per row)
    val stats = base.agg(max($"event_id"), count(lit(1)), max($"ts_sec"), min($"ts_sec")).first()
    require(!stats.isNullAt(0), s"events table under $sfDir is empty")
    val maxId = stats.getLong(0) + 1
    val baseRows = stats.getLong(1)
    val spanSec = stats.getLong(2) - stats.getLong(3)
    val replicated = base
      .crossJoin(spark.range(replicas).select($"id".as("rep")))
      .select(
        ($"event_id" + $"rep" * maxId).as("event_id"),
        ($"user_id" + $"rep" * 1000000L).as("user_id"),
        $"event_type", $"item", $"ts_sec")
    val stage = java.nio.file.Files.createTempDirectory("events-sbench").toString
    replicated.repartition(64).write.mode("overwrite").csv(stage)
    // derived, not recounted - a count() here would re-execute the cross
    // join the write already evaluated
    val totalRows = baseRows * replicas

    val schema = "event_id LONG, user_id LONG, event_type STRING, item LONG, ts_sec LONG"
    val outRows = new java.util.concurrent.atomic.AtomicLong(0)
    val t0 = System.nanoTime()
    val q = spark.readStream
      .schema(schema)
      .option("maxFilesPerTrigger", 8)
      .csv(stage)
      .withColumn("eventTime", timestamp_seconds(col("ts_sec")))
      // the staged files hold a RANDOM shuffle of the full time range, so
      // the watermark delay must cover the whole span or batches after the
      // first silently DROP almost every row as late and the "throughput"
      // measures parsing of discarded data (a 0-second watermark here cost
      // exactly that). Production arrival is roughly ordered and wants a
      // short delay; an unordered replay wants the span.
      .withWatermark("eventTime", s"${spanSec + 60} seconds")
      .groupBy(window($"eventTime", "6 hours", "1 hour"), $"item")
      .agg(count(lit(1)).as("cnt"))
      .select(unix_timestamp($"window.end").as("windowEnd"), $"item", $"cnt")
      .writeStream
      .outputMode("update")
      .foreachBatch { (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        // rank the updated windows like the reference's sink-side top-N
        val ranked = graft.operators.Windowed.topNPerWindow(b.toDF(), col("item"), 5)
        outRows.addAndGet(ranked.count())
        ()
      }
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("ckpt-sbench").toString)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val secs = (System.nanoTime() - t0) / 1e9
    println(
      s"""{"metric":"stream_rows_per_sec","value":${(totalRows / secs).toLong},""" +
        s""""unit":"rows/sec","rows":$totalRows,"secs":$secs,""" +
        s""""ranked_out":${outRows.get()},"sf":"$sfDir","replicas":$replicas}""")

    // Second probe: the stateful-detector path — the TTL'd blacklist NFA
    // (flatMapGroupsWithState + EventTimeTimeout, one counter per
    // (user, ad, day) key with day-end expiry) over the same replay, so
    // the per-key state-store path gets its own rows/sec next to the
    // windowed-aggregation number above.
    val detOut = new java.util.concurrent.atomic.AtomicLong(0)
    val t1 = System.nanoTime()
    val clicks = spark.readStream
      .schema(schema)
      .option("maxFilesPerTrigger", 8)
      .csv(stage)
      .select(
        col("user_id").as("userId"),
        col("item").as("adId"),
        lit("p").as("province"),
        lit("c").as("city"),
        col("ts_sec").as("timestamp"))
      .withColumn("eventTime", timestamp_seconds(col("timestamp")))
      .withWatermark("eventTime", s"${spanSec + 60} seconds")
      .as[graft.model.AdClickEvent]
    val q2 = graft.operators.AdBlacklist
      .streaming(clicks, threshold = 100)
      .writeStream
      .outputMode("append")
      .foreachBatch { (b: org.apache.spark.sql.Dataset[graft.operators.AdBlacklist.AdOut], _: Long) =>
        detOut.addAndGet(b.count())
        ()
      }
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("ckpt-sbench-det").toString)
      .trigger(Trigger.AvailableNow())
      .start()
    q2.awaitTermination()
    val secs2 = (System.nanoTime() - t1) / 1e9
    println(
      s"""{"metric":"detector_rows_per_sec","value":${(totalRows / secs2).toLong},""" +
        s""""unit":"rows/sec","rows":$totalRows,"secs":$secs2,""" +
        s""""out_rows":${detOut.get()},"sf":"$sfDir","replicas":$replicas}""")

    // Third probe: the relaxed-funnel chained stream-stream joins — a
    // time-ORDERED chunked replay (MemoryStream; the staged files are
    // shuffled, which would pin the watermark) so the interval-join state
    // is observable EVICTING as the watermark advances. Published numbers:
    // rows/sec plus peak and final state rows across both join operators —
    // the plateau evidence that state is horizon-bounded, not
    // replay-length-bounded (StreamsSpec asserts the same on the fixture).
    {
      import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
      implicit val sq = spark.sqlContext
      val funnelEvs = base
        .filter($"event_type".isin("view", "click", "purchase"))
        .select($"event_id", $"user_id", $"event_type", $"ts_sec")
        .as[(Long, Long, String, Long)]
        .collect()
        .sortBy(e => (e._4, e._1))
      val mem = MemoryStream[(Long, Long, String, Long)]
      val outRows3 = new java.util.concurrent.atomic.AtomicLong(0)
      val stateSeries = scala.collection.mutable.ArrayBuffer.empty[Long]
      val src = mem.toDF()
        .toDF("event_id", "user_id", "event_type", "ts_sec")
        .withColumn("eventTime", timestamp_seconds(col("ts_sec")))
        .withWatermark("eventTime", "60 seconds")
      val t2 = System.nanoTime()
      val q3 = Streams
        .funnelRelaxed(src, ("view", "click", "purchase"), windowSec = 86400L)
        .writeStream
        .outputMode("append")
        .foreachBatch { (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
          outRows3.addAndGet(b.count())
          ()
        }
        .option("checkpointLocation",
          java.nio.file.Files.createTempDirectory("ckpt-sbench-funnel").toString)
        .start()
      // 8 ordered chunks: enough watermark advances to watch eviction;
      // each chunk pays the fixed multi-stateful-operator micro-batch
      // cost (4 state stores per join x partitions), so the published
      // rows/sec is OVERHEAD-bound — the state columns are the point
      val chunkSize = math.max(1, funnelEvs.length / 8)
      var idx = 0
      while (idx < funnelEvs.length) {
        var end = math.min(idx + chunkSize, funnelEvs.length)
        while (end < funnelEvs.length && funnelEvs(end)._4 == funnelEvs(end - 1)._4) end += 1
        mem.addData(funnelEvs.slice(idx, end).toSeq)
        q3.processAllAvailable()
        val p = q3.lastProgress
        if (p != null && p.stateOperators.nonEmpty)
          stateSeries += p.stateOperators.map(_.numRowsTotal).sum
        idx = end
      }
      q3.stop()
      val secs3 = (System.nanoTime() - t2) / 1e9
      println(
        s"""{"metric":"funnel_rows_per_sec","value":${(funnelEvs.length / secs3).toLong},""" +
          s""""unit":"rows/sec","rows":${funnelEvs.length},"secs":$secs3,""" +
          s""""triples":${outRows3.get()},"state_peak_rows":${if (stateSeries.isEmpty) 0L else stateSeries.max},""" +
          s""""state_final_rows":${if (stateSeries.isEmpty) 0L else stateSeries.last},"sf":"$sfDir"}""")
    }
    // Fourth probe: the generic relaxed CEP (Cep.followedByStreaming —
    // e_view_to_click's operator) over a time-ORDERED view/click replay.
    // State is the open-runs vector per user and every run is at most
    // windowSec old before its deadline fires, so total state rows track
    // the opens-within-one-window horizon, not the replay length — the
    // same plateau evidence as the funnel probe above (methodology
    // shared; numbers recorded in SCALING.md ("CEP streaming state probe")).
    {
      import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
      implicit val sq = spark.sqlContext
      val vcEvs = base
        .filter($"event_type".isin("view", "click"))
        .select($"event_id", $"user_id", $"event_type", $"ts_sec")
        .as[VcEv]
        .collect()
        .sortBy(e => (e.ts_sec, e.event_id))
      val mem = MemoryStream[VcEv]
      // watermark applied AFTER the last object transform so the event-time
      // column reaches flatMapGroupsWithState's child output
      val src = mem.toDS()
        .withColumn("eventTime", timestamp_seconds(col("ts_sec")))
        .withWatermark("eventTime", "60 seconds")
        .as[VcEv]
      val steps = Seq[VcEv => Boolean](_.event_type == "view", _.event_type == "click")
      val outRows4 = new java.util.concurrent.atomic.AtomicLong(0)
      val stateSeries = scala.collection.mutable.ArrayBuffer.empty[Long]
      val t3 = System.nanoTime()
      val q4 = graft.operators.Cep
        .followedByStreaming[VcEv](
          src, _.user_id, _.ts_sec, _.event_id, steps, windowSec = 3600L)
        .writeStream
        .outputMode("append")
        .foreachBatch {
          (b: org.apache.spark.sql.Dataset[graft.operators.Out[graft.operators.Cep.FollowedMatch]],
           _: Long) =>
            outRows4.addAndGet(b.count())
            ()
        }
        .option("checkpointLocation",
          java.nio.file.Files.createTempDirectory("ckpt-sbench-cep").toString)
        .start()
      // ordered chunks cut where the timestamp strictly increases (a tie
      // straddling a chunk boundary would be dropped as late in the next
      // batch — the <= watermark filter)
      val chunkSize4 = math.max(1, vcEvs.length / 8)
      var idx4 = 0
      while (idx4 < vcEvs.length) {
        var end = math.min(idx4 + chunkSize4, vcEvs.length)
        while (end < vcEvs.length && vcEvs(end).ts_sec == vcEvs(end - 1).ts_sec) end += 1
        mem.addData(vcEvs.slice(idx4, end).toSeq)
        q4.processAllAvailable()
        val p = q4.lastProgress
        if (p != null && p.stateOperators.nonEmpty)
          stateSeries += p.stateOperators.map(_.numRowsTotal).sum
        idx4 = end
      }
      q4.stop()
      val secs4 = (System.nanoTime() - t3) / 1e9
      println(
        s"""{"metric":"cep_followed_rows_per_sec","value":${(vcEvs.length / secs4).toLong},""" +
          s""""unit":"rows/sec","rows":${vcEvs.length},"secs":$secs4,""" +
          s""""out_rows":${outRows4.get()},"state_peak_rows":${if (stateSeries.isEmpty) 0L else stateSeries.max},""" +
          s""""state_final_rows":${if (stateSeries.isEmpty) 0L else stateSeries.last},"sf":"$sfDir"}""")
    }

    // Fifth probe: streaming as-of retention — the round-9 maxAgeSec knob
    // measured head-to-head. Same ordered view/click replay, through
    // AsOf.lastAtOrBeforeStreaming twice: un-expiring (the feature-store
    // default — state is one 16-byte row per key EVER built, so the final
    // count equals the distinct build-key cardinality) and maxAgeSec=3600
    // (EventTimeTimeout — state tracks only keys built within the last
    // hour of event time, the bounded-retention trade). Numbers recorded
    // in SCALING.md ("as-of streaming retention probe").
    {
      import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
      implicit val sq = spark.sqlContext
      val vcEvs = base
        .filter($"event_type".isin("view", "click"))
        .select($"event_id", $"user_id", $"event_type", $"ts_sec")
        .as[VcEv]
        .collect()
        .sortBy(e => (e.ts_sec, e.event_id))
      Seq(("asof_unexpiring", None), ("asof_ttl_1h", Some(3600L))).foreach {
        case (label, ttl) =>
          val mem = MemoryStream[VcEv]
          val src = mem.toDS()
            .withColumn("eventTime", timestamp_seconds(col("ts_sec")))
            .withWatermark("eventTime", "60 seconds")
            .as[VcEv]
          val outRows5 = new java.util.concurrent.atomic.AtomicLong(0)
          val stateSeries = scala.collection.mutable.ArrayBuffer.empty[Long]
          val t4 = System.nanoTime()
          val q5 = graft.operators.AsOf
            .lastAtOrBeforeStreaming[VcEv](
              src, _.user_id, _.ts_sec, _.event_id, _.event_type == "click", maxAgeSec = ttl)
            .writeStream
            .outputMode("append")
            .foreachBatch {
              (b: org.apache.spark.sql.Dataset[graft.operators.AsOf.AsOfMatch], _: Long) =>
                outRows5.addAndGet(b.count())
                ()
            }
            .option("checkpointLocation",
              java.nio.file.Files.createTempDirectory(s"ckpt-sbench-$label").toString)
            .start()
          val chunkSize5 = math.max(1, vcEvs.length / 8)
          var idx5 = 0
          while (idx5 < vcEvs.length) {
            var end = math.min(idx5 + chunkSize5, vcEvs.length)
            while (end < vcEvs.length && vcEvs(end).ts_sec == vcEvs(end - 1).ts_sec) end += 1
            mem.addData(vcEvs.slice(idx5, end).toSeq)
            q5.processAllAvailable()
            val p = q5.lastProgress
            if (p != null && p.stateOperators.nonEmpty)
              stateSeries += p.stateOperators.map(_.numRowsTotal).sum
            idx5 = end
          }
          q5.stop()
          val secs5 = (System.nanoTime() - t4) / 1e9
          println(
            s"""{"metric":"${label}_rows_per_sec","value":${(vcEvs.length / secs5).toLong},""" +
              s""""unit":"rows/sec","rows":${vcEvs.length},"secs":$secs5,""" +
              s""""out_rows":${outRows5.get()},"state_peak_rows":${if (stateSeries.isEmpty) 0L else stateSeries.max},""" +
              s""""state_final_rows":${if (stateSeries.isEmpty) 0L else stateSeries.last},"sf":"$sfDir"}""")
      }
    }
    // Sixth probe: streaming PQ encode — the live-index ingest path's
    // quantization throughput. Embeddings replicated with shifted ids,
    // staged as a parquet file stream, driven through pqEncodeStream
    // (frozen codebook folded into the plan) with AvailableNow. The
    // probe publishes rows/sec AND the state-store row count, which must
    // be ZERO: encoding is a pure projection, so a live index ingests at
    // scan speed with no state to checkpoint or recover. Numbers in
    // SCALING.md ("streaming ingest probes: PQ encode + span scrub").
    {
      graft.functions.GraftFunctions.registerDotD(spark)
      val emb = Tables.embeddings(spark, sfDir)
      val codebook = graft.queries.VectorOps.pqCodebook(emb)
      val maxVec = emb.agg(max($"vec_id")).first().getLong(0) + 1
      val vecRep = emb
        .crossJoin(spark.range(replicas).select($"id".as("rep")))
        .select(($"vec_id" + $"rep" * maxVec).as("vec_id"), $"embedding")
      val stage6 = java.nio.file.Files.createTempDirectory("emb-sbench").toString
      vecRep.repartition(32).write.mode("overwrite").parquet(stage6)
      val nVecs = emb.count() * replicas
      val outRows6 = new java.util.concurrent.atomic.AtomicLong(0)
      var statePeak6 = 0L
      val t6 = System.nanoTime()
      val q6 = Streams
        .pqEncodeStream(
          spark.readStream
            .schema("vec_id LONG, embedding ARRAY<FLOAT>")
            .option("maxFilesPerTrigger", 8)
            .parquet(stage6),
          codebook)
        .writeStream
        .outputMode("append")
        .foreachBatch { (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
          outRows6.addAndGet(b.count())
          ()
        }
        .option("checkpointLocation",
          java.nio.file.Files.createTempDirectory("ckpt-sbench-pq").toString)
        .trigger(Trigger.AvailableNow())
        .start()
      q6.awaitTermination()
      val p6 = q6.lastProgress
      if (p6 != null && p6.stateOperators.nonEmpty)
        statePeak6 = p6.stateOperators.map(_.numRowsTotal).sum
      val secs6 = (System.nanoTime() - t6) / 1e9
      println(
        s"""{"metric":"pq_encode_rows_per_sec","value":${(nVecs / secs6).toLong},""" +
          s""""unit":"rows/sec","rows":$nVecs,"secs":$secs6,""" +
          s""""out_rows":${outRows6.get()},"state_rows":$statePeak6,"sf":"$sfDir"}""")
    }

    // Seventh probe: streaming span scrub — day-2 span-grain ingest
    // against the STORED base index (written to parquet and re-read as
    // the static join side, exactly the artifact shape a deployment
    // uses). Documents replicated with shifted ids; every replica doc's
    // windows hit the base index, so this is the worst-case emit rate.
    // State must again be ZERO (stateless stream-static equi-join).
    {
      val docsDf = Tables.documents(spark, sfDir).select($"doc_id", $"text")
      val idxDir = java.nio.file.Files.createTempDirectory("spanidx-sbench").toString
      graft.queries.TextOps.substringIndexOn(docsDf)
        .write.mode("overwrite").parquet(idxDir)
      val baseIdx = spark.read.parquet(idxDir)
      val maxDoc = docsDf.agg(max($"doc_id")).first().getLong(0) + 1
      val docRep = docsDf
        .crossJoin(spark.range(replicas).select($"id".as("rep")))
        .select(($"doc_id" + $"rep" * maxDoc).as("doc_id"), $"text")
      val stage7 = java.nio.file.Files.createTempDirectory("docs-sbench").toString
      docRep.repartition(32).write.mode("overwrite").parquet(stage7)
      val nDocs = docsDf.count() * replicas
      val outRows7 = new java.util.concurrent.atomic.AtomicLong(0)
      var statePeak7 = 0L
      val t7 = System.nanoTime()
      val q7 = Streams
        .substringScrubSpansStream(
          spark.readStream
            .schema("doc_id LONG, text STRING")
            .option("maxFilesPerTrigger", 8)
            .parquet(stage7),
          baseIdx)
        .writeStream
        .outputMode("append")
        .foreachBatch { (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
          outRows7.addAndGet(b.count())
          ()
        }
        .option("checkpointLocation",
          java.nio.file.Files.createTempDirectory("ckpt-sbench-span").toString)
        .trigger(Trigger.AvailableNow())
        .start()
      q7.awaitTermination()
      val p7 = q7.lastProgress
      if (p7 != null && p7.stateOperators.nonEmpty)
        statePeak7 = p7.stateOperators.map(_.numRowsTotal).sum
      val secs7 = (System.nanoTime() - t7) / 1e9
      println(
        s"""{"metric":"span_scrub_docs_per_sec","value":${(nDocs / secs7).toLong},""" +
          s""""unit":"rows/sec","rows":$nDocs,"secs":$secs7,""" +
          s""""out_spans":${outRows7.get()},"state_rows":$statePeak7,"sf":"$sfDir"}""")
    }
    // Eighth probe: streaming last-touch attribution — the behavioral
    // state family's live surface. Replays the staged event CSV through
    // attributionStream; state is ONE row per active user (the 24-byte
    // last-view carry), so the published state_rows must equal the
    // replicated user count, NOT scale with events — the plateau that
    // makes the operator runnable forever.
    {
      val outRows8 = new java.util.concurrent.atomic.AtomicLong(0)
      var statePeak8 = 0L
      val nUsers = replicated.select($"user_id").distinct().count()
      val t8 = System.nanoTime()
      val q8 = Streams
        .attributionStream(
          spark.readStream
            .schema(schema)
            .option("maxFilesPerTrigger", 8)
            .csv(stage)
            .filter($"event_type".isin("view", "purchase"))
            .withColumn("cents", $"event_id" % 10000L)) // deterministic stand-in value
        .writeStream
        .outputMode("append")
        .foreachBatch { (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
          outRows8.addAndGet(b.count())
          ()
        }
        .option("checkpointLocation",
          java.nio.file.Files.createTempDirectory("ckpt-sbench-attrib").toString)
        .trigger(Trigger.AvailableNow())
        .start()
      q8.awaitTermination()
      val p8 = q8.lastProgress
      if (p8 != null && p8.stateOperators.nonEmpty)
        statePeak8 = p8.stateOperators.map(_.numRowsTotal).sum
      val secs8 = (System.nanoTime() - t8) / 1e9
      println(
        s"""{"metric":"attribution_rows_per_sec","value":${(totalRows / secs8).toLong},""" +
          s""""unit":"rows/sec","rows":$totalRows,"secs":$secs8,""" +
          s""""credits":${outRows8.get()},"state_rows":$statePeak8,""" +
          s""""active_users":$nUsers,"sf":"$sfDir"}""")
    }
    // Ninth probe: the late-data audit under a replayed out-of-order
    // storm — quantified evidence for the W6 semantic delta (Flink
    // allowedLateness re-fire vs Spark drop-at-watermark + audit tee).
    // The replicated events are re-sequenced into an ARRIVAL order where
    // 10% of rows (user_id % 10 == 0) arrive an hour of stream time
    // late, fed in event-arrival order via MemoryStream chunks so the
    // watermark advances between micro-batches exactly as live ingest
    // would. Two measurements over the SAME arrival sequence:
    //   (a) ground truth: a tumbling windowed count at the same lateness
    //       budget (plus a far-future flush sentinel so every window
    //       finalizes); total minus emitted = rows the aggregation
    //       actually discarded, and
    //   (b) the audit: rows lateAudit flags.
    // The two are DIFFERENT grains by design — the agg drops an event
    // only once its whole window is finalized, the audit marks per event
    // against its bucket's running max — so the probe publishes both
    // fractions; the audit must flag at least the window-grain drops
    // minus the bucket-lag approximation documented on lateAudit.
    {
      import graft.model.UserBehavior
      import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
      implicit val sqlCtx = spark.sqlContext
      import org.apache.spark.sql.{Dataset, Row}
      val latenessSec = 600L
      val chunkRows = 50000
      val baseEvents = replicated
        .select($"user_id", coalesce($"item", lit(0L)).as("item"), $"event_type", $"ts_sec")

      def storm(mode: String, stormDelaySec: Long): Unit = {
        val arrival = baseEvents
          .withColumn("arrival",
            $"ts_sec" + when($"user_id" % 10 === 0, lit(stormDelaySec)).otherwise(lit(0L)))
          .orderBy($"arrival", $"user_id")
          .collect()
          .map(r => UserBehavior(r.getLong(0), r.getLong(1), 0, r.getString(2), r.getLong(3)))
        val chunks = arrival.grouped(chunkRows).toSeq
        val maxTs = arrival.map(_.timestamp).max

        // (a) ground truth: what the windowed aggregation actually discards
        val memA = MemoryStream[UserBehavior]
        val emitted = new java.util.concurrent.atomic.AtomicLong(0)
        val qa = Streams.withEventTime(memA.toDS(), s"$latenessSec seconds")
          .groupBy(window(col("eventTime"), "3600 seconds"))
          .agg(count(lit(1)).as("cnt"))
          .writeStream
          .outputMode("append")
          .foreachBatch { (b: Dataset[Row], _: Long) =>
            emitted.addAndGet(b.collect().map(_.getAs[Long]("cnt")).sum)
            ()
          }
          .option("checkpointLocation",
            java.nio.file.Files.createTempDirectory("ckpt-sbench-late-a").toString)
          .start()
        val t9 = System.nanoTime()
        chunks.foreach { c => memA.addData(c); qa.processAllAvailable() }
        // two flush sentinels: the first pushes the watermark past every
        // real window, the second finalizes the first's own window
        memA.addData(Seq(UserBehavior(1L, 0L, 0, "flush", maxTs + 100 * latenessSec)))
        qa.processAllAvailable()
        memA.addData(Seq(UserBehavior(1L, 0L, 0, "flush2", maxTs + 200 * latenessSec)))
        qa.processAllAvailable()
        val secs9 = (System.nanoTime() - t9) / 1e9
        qa.stop()
        val kept = emitted.get() - 1 // minus the finalized first sentinel
        val dropped = arrival.length - kept

        // (b) the audit's marks over the same storm
        val memB = MemoryStream[UserBehavior]
        val flagged = new java.util.concurrent.atomic.AtomicLong(0)
        val qb = Streams.lateAudit(memB.toDS(), latenessSec)
          .writeStream
          .outputMode("append")
          .foreachBatch { (b: Dataset[UserBehavior], _: Long) =>
            flagged.addAndGet(b.count())
            ()
          }
          .option("checkpointLocation",
            java.nio.file.Files.createTempDirectory("ckpt-sbench-late-b").toString)
          .start()
        chunks.foreach { c => memB.addData(c); qb.processAllAvailable() }
        qb.stop()
        val n = arrival.length
        println(
          s"""{"metric":"late_audit_storm","mode":"$mode","rows":$n,""" +
            s""""late_injected":${arrival.count(_.userId % 10 == 0)},""" +
            s""""agg_dropped":$dropped,"agg_dropped_ppm":${dropped * 1000000L / n},""" +
            s""""audit_flagged":${flagged.get()},"audit_flagged_ppm":${flagged.get() * 1000000L / n},""" +
            s""""lateness_sec":$latenessSec,"storm_delay_sec":$stormDelaySec,"secs":$secs9,"sf":"$sfDir"}""")
      }

      // span of one micro-batch in stream time, for sizing the two storms
      val tsStats = baseEvents.agg(min($"ts_sec"), max($"ts_sec")).first()
      val chunkSpanSec =
        (tsStats.getLong(1) - tsStats.getLong(0)) * chunkRows / math.max(totalRows, 1L)
      // intra-batch storm: stragglers lag a real hour but land in the
      // SAME micro-batch as their peers — Spark's batch-granularity
      // watermark forgives nearly all of them (the measured Flink delta:
      // a per-record watermark would not)
      storm("intra_batch", 3600L)
      // cross-batch storm: stragglers arrive ~3 micro-batches late, far
      // beyond the lateness budget — the agg must drop ~all of them and
      // the audit must flag ~the same set (bucket-lag approximation aside)
      storm("cross_batch", 3 * chunkSpanSec)
    }

    // Tenth probe: standing-query alert routing — the documents table
    // replayed through the three alert projections (phrase, proximity,
    // BM25-from-stored-stats). All three are stateless per-doc
    // projections, so rows/sec here IS the line-rate number the
    // "composes onto any ingest stream" claim owes; numbers recorded in
    // SCALING.md ("alert-stream routing probe").
    locally {
      val docsBase = Tables.documents(spark, sfDir).select($"doc_id", $"text")
      val dStats = docsBase.agg(max($"doc_id"), count(lit(1))).first()
      val dMax = dStats.getLong(0) + 1
      val dRows = dStats.getLong(1) * replicas
      val staged = docsBase
        .crossJoin(spark.range(replicas).select($"id".as("rep")))
        .select(($"doc_id" + $"rep" * dMax).as("doc_id"), $"text")
      val dStage = java.nio.file.Files.createTempDirectory("docs-sbench").toString
      staged.repartition(64).write.mode("overwrite").parquet(dStage)
      val idx = java.nio.file.Files.createTempDirectory("sbench-postings").toString
      graft.queries.SearchOps.writePostingsIndex(docsBase, idx)
      def alertProbe(tag: String)(mk: org.apache.spark.sql.DataFrame
          => org.apache.spark.sql.DataFrame): Unit = {
        val hits = new java.util.concurrent.atomic.AtomicLong(0)
        val tA = System.nanoTime()
        val qa = mk(spark.readStream
            .schema("doc_id LONG, text STRING").parquet(dStage))
          .writeStream
          .outputMode("append")
          .foreachBatch { (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
            hits.addAndGet(b.count())
            ()
          }
          .option("checkpointLocation",
            java.nio.file.Files.createTempDirectory(s"ckpt-sbench-$tag").toString)
          .trigger(Trigger.AvailableNow())
          .start()
        qa.awaitTermination()
        val secsA = (System.nanoTime() - tA) / 1e9
        println(
          s"""{"metric":"alert_rows_per_sec","alert":"$tag",""" +
            s""""value":${(dRows / secsA).toLong},"unit":"rows/sec",""" +
            s""""rows":$dRows,"hits":${hits.get()},"secs":$secsA,"sf":"$sfDir"}""")
      }
      alertProbe("phrase")(Streams.phraseAlertStream(_, Seq("spark", "join")))
      alertProbe("proximity")(Streams.proximityAlertStream(_, "spark", "join", 3))
      alertProbe("bm25")(Streams.bm25AlertStream(_, idx, Seq("spark", "join", "window")))
    }

    // The four serving-tier probes' SHARED request staging: the
    // embedding corpus replayed `replicas` times under fresh
    // non-colliding query ids (+1000000 offset past every stored
    // vec_id), written to a scratch dir the stream reads file-batched.
    // One definition so the staging convention cannot drift across the
    // tiers and their req/s stay directly comparable.
    def stageRequests(emb: org.apache.spark.sql.DataFrame, prefix: String)
        : (Long, String) = {
      val eStats = emb.agg(max($"vec_id"), count(lit(1))).first()
      val eMax = eStats.getLong(0) + 1
      val nReq = eStats.getLong(1) * replicas
      val staged = emb
        .crossJoin(spark.range(replicas).select($"id".as("rep")))
        .select(($"vec_id" + $"rep" * eMax + 1000000L).as("query_id"), $"embedding")
      val rStage = java.nio.file.Files.createTempDirectory(prefix).toString
      staged.repartition(8).write.mode("overwrite").parquet(rStage)
      (nReq, rStage)
    }
    // Eleventh probe: ONLINE ANN SERVING — the request path
    // (annServeStream: stored-BQ Hamming screen + exact float rerank,
    // overwrite-mode per-batch sink). Requests are the embedding corpus
    // replayed under fresh request ids, so every request does real
    // screen+rerank work against the full stored history. Publishes
    // end-to-end requests/sec; numbers
    // recorded in SCALING.md ("ANN serving probe").
    locally {
      val emb = Tables.embeddings(spark, sfDir)
      val idx = java.nio.file.Files.createTempDirectory("sbench-bq").toString
      graft.queries.VectorOps.writeBqIndex(emb, idx)
      val (nReq, rStage) = stageRequests(emb, "reqs-sbench")
      val out = java.nio.file.Files.createTempDirectory("serve-sbench").toString
      val t0 = System.nanoTime()
      val q = Streams.annServeStream(
        spark.readStream.schema("query_id LONG, embedding ARRAY<FLOAT>")
          .option("maxFilesPerTrigger", "2").parquet(rStage),
        idx, emb, out,
        java.nio.file.Files.createTempDirectory("ckpt-sbench-serve").toString,
        trigger = Some(Trigger.AvailableNow()))
      q.awaitTermination()
      val secs = (System.nanoTime() - t0) / 1e9
      val answered = spark.read.option("basePath", out).parquet(out)
        .select($"query_id").distinct().count()
      println(
        s"""{"metric":"ann_serve_requests_per_sec","value":${(nReq / secs).toLong},""" +
          s""""unit":"requests/sec","requests":$nReq,"answered":$answered,""" +
          s""""secs":$secs,"sf":"$sfDir"}""")
    }
    // Twelfth probe: ONLINE IVF-PQ SERVING — the refine funnel under
    // standing request traffic (ivfPqServeStream: cell-pruned ADC
    // short list + exact float refine, overwrite-mode per-batch sink).
    // Same request staging as the BQ probe, so the two serving tiers'
    // throughputs are directly comparable; numbers recorded in
    // SCALING.md ("ANN serving probe").
    locally {
      val emb = Tables.embeddings(spark, sfDir)
      val idx = java.nio.file.Files.createTempDirectory("sbench-ivfpq").toString
      graft.queries.VectorOps.writeIvfPqIndex(emb, idx)
      val (nReq, rStage) = stageRequests(emb, "reqs-sbench-pq")
      val out = java.nio.file.Files.createTempDirectory("serve-sbench-pq").toString
      val t0 = System.nanoTime()
      val q = Streams.ivfPqServeStream(
        spark.readStream.schema("query_id LONG, embedding ARRAY<FLOAT>")
          .option("maxFilesPerTrigger", "2").parquet(rStage),
        idx, emb, out,
        java.nio.file.Files.createTempDirectory("ckpt-sbench-pqserve").toString,
        trigger = Some(Trigger.AvailableNow()))
      q.awaitTermination()
      val secs = (System.nanoTime() - t0) / 1e9
      val answered = spark.read.option("basePath", out).parquet(out)
        .select($"query_id").distinct().count()
      println(
        s"""{"metric":"ivfpq_serve_requests_per_sec","value":${(nReq / secs).toLong},""" +
          s""""unit":"requests/sec","requests":$nReq,"answered":$answered,""" +
          s""""secs":$secs,"sf":"$sfDir"}""")
    }
    // Thirteenth probe: ONLINE 3-TIER CASCADE SERVING — the stored
    // BQ+SQ8 artifacts under the same request staging as probes 11/12,
    // so all three serving tiers publish directly comparable req/s.
    // The cascade trades probe 11's full-screen float fetches (C1=100
    // per request) for stored-code fetches + C2=30 floats; numbers in
    // SCALING.md ("ANN serving probe").
    locally {
      val emb = Tables.embeddings(spark, sfDir)
      val bqIdx = java.nio.file.Files.createTempDirectory("sbench-casc-bq").toString
      val sqIdx = java.nio.file.Files.createTempDirectory("sbench-casc-sq8").toString
      graft.queries.VectorOps.writeBqIndex(emb, bqIdx)
      graft.queries.VectorOps.writeSq8Index(emb, sqIdx)
      val (nReq, rStage) = stageRequests(emb, "reqs-sbench-casc")
      val out = java.nio.file.Files.createTempDirectory("serve-sbench-casc").toString
      val t0 = System.nanoTime()
      val q = Streams.cascadeServeStream(
        spark.readStream.schema("query_id LONG, embedding ARRAY<FLOAT>")
          .option("maxFilesPerTrigger", "2").parquet(rStage),
        bqIdx, sqIdx, emb, out,
        java.nio.file.Files.createTempDirectory("ckpt-sbench-cascserve").toString,
        trigger = Some(Trigger.AvailableNow()))
      q.awaitTermination()
      val secs = (System.nanoTime() - t0) / 1e9
      val answered = spark.read.option("basePath", out).parquet(out)
        .select($"query_id").distinct().count()
      println(
        s"""{"metric":"cascade_serve_requests_per_sec","value":${(nReq / secs).toLong},""" +
          s""""unit":"requests/sec","requests":$nReq,"answered":$answered,""" +
          s""""secs":$secs,"sf":"$sfDir"}""")
    }
    // Fourteenth probe: STANDING CASCADE INGEST — the write path the
    // three serving probes assume already happened. Deltas are the
    // embedding corpus replayed under fresh vec_ids, streamed through
    // cascadeIngestStream (per-batch durable paired append: BQ words +
    // SQ8 codes per micro-batch, intent-ledger exactly-once). Publishes
    // end-to-end vectors/sec AND the closing coverage audit (must be
    // (corpus + ingested, 0, 0) — a nonzero single-tier count means a
    // batch straddled the pair, which the protocol exists to prevent).
    // Numbers recorded in SCALING.md ("cascade ingest probe").
    locally {
      val emb = Tables.embeddings(spark, sfDir)
      val bqIdx = java.nio.file.Files.createTempDirectory("sbench-ing-bq").toString
      val sqIdx = java.nio.file.Files.createTempDirectory("sbench-ing-sq8").toString
      graft.queries.VectorOps.writeBqIndex(emb, bqIdx)
      graft.queries.VectorOps.writeSq8Index(emb, sqIdx)
      val eStats = emb.agg(max($"vec_id"), count(lit(1))).first()
      val eMax = eStats.getLong(0) + 1
      val nVec = eStats.getLong(1) * replicas
      // fresh ids start at eMax so no replica can collide with a base
      // vec_id (these ids ENTER the index; a fixed +2e6 offset would
      // break the new-ids-only contract on any corpus with ids past it)
      val staged = emb
        .crossJoin(spark.range(replicas).select($"id".as("rep")))
        .select(($"vec_id" + ($"rep" + 1L) * eMax).as("vec_id"), $"embedding")
      val dStage = java.nio.file.Files.createTempDirectory("deltas-sbench").toString
      staged.repartition(8).write.mode("overwrite").parquet(dStage)
      val t0 = System.nanoTime()
      val q = Streams.cascadeIngestStream(
        spark.readStream.schema("vec_id LONG, embedding ARRAY<FLOAT>")
          .option("maxFilesPerTrigger", "2").parquet(dStage),
        bqIdx, sqIdx,
        java.nio.file.Files.createTempDirectory("ckpt-sbench-ingest").toString,
        trigger = Some(Trigger.AvailableNow()))
      q.awaitTermination()
      val secs = (System.nanoTime() - t0) / 1e9
      val cov = graft.queries.VectorOps
        .cascadeCoverageAudit(spark, bqIdx, sqIdx).first()
      println(
        s"""{"metric":"cascade_ingest_vectors_per_sec","value":${(nVec / secs).toLong},""" +
          s""""unit":"vectors/sec","vectors":$nVec,"both_tiers":${cov.getLong(0)},""" +
          s""""bq_only":${cov.getLong(1)},"sq8_only":${cov.getLong(2)},""" +
          s""""secs":$secs,"sf":"$sfDir"}""")
    }
    // Fifteenth probe: STANDING POSTINGS INGEST — the text-side ingest
    // twin of probe 14 (generic single-family path: per-batch epoch
    // marker, exactly-once). Deltas are the documents table replayed
    // under fresh doc_ids; each micro-batch becomes one committed
    // postings epoch (bucket-partitioned positional slices + the terms/
    // corpus stats rewrite), so the probe prices the real cost of a
    // LIVE searchable index: the per-batch stats rewrite is the term
    // dictionary's rewrite-component tax, amortized by batch size.
    // Publishes docs/sec + the final epoch count and a search sanity
    // hit count over the ingested window.
    locally {
      import graft.sources.IndexManifest
      val docs = Tables.documents(spark, sfDir).select($"doc_id", $"text")
      val idx = java.nio.file.Files.createTempDirectory("sbench-post").toString
      graft.queries.SearchOps.writePostingsIndex(docs, idx)
      val dStats = docs.agg(max($"doc_id"), count(lit(1))).first()
      val dMax = dStats.getLong(0) + 1
      val nDocs = dStats.getLong(1) * replicas
      val staged = docs
        .crossJoin(spark.range(replicas).select($"id".as("rep")))
        .select(($"doc_id" + ($"rep" + 1L) * dMax).as("doc_id"), $"text")
      val dStage = java.nio.file.Files.createTempDirectory("docs-sbench").toString
      staged.repartition(8).write.mode("overwrite").parquet(dStage)
      val epoch = () => IndexManifest.committedEpoch(idx, IndexManifest.Postings)
      val t0 = System.nanoTime()
      val q = Streams.indexIngestStream(
        spark.readStream.schema("doc_id LONG, text STRING")
          .option("maxFilesPerTrigger", "2").parquet(dStage),
        epoch,
        graft.queries.SearchOps.appendPostingsIndex(_, idx),
        java.nio.file.Files.createTempDirectory("ckpt-sbench-post").toString,
        trigger = Some(Trigger.AvailableNow()))
      q.awaitTermination()
      val secs = (System.nanoTime() - t0) / 1e9
      val hits = graft.queries.SearchOps
        .bm25SearchFromIndex(spark, idx, Seq("the"), 10).count()
      println(
        s"""{"metric":"postings_ingest_docs_per_sec","value":${(nDocs / secs).toLong},""" +
          s""""unit":"docs/sec","docs":$nDocs,"epochs":${epoch()},"hits":$hits,""" +
          s""""secs":$secs,"sf":"$sfDir"}""")
    }
    // Sixteenth probe: ONLINE HYBRID SERVING — the serving matrix's
    // fourth tier (hybridServeStream: bucket-pruned BM25 leg +
    // cell-pruned ADC leg + per-request exact-integer RRF fusion)
    // under the same request staging as probes 11-13, so all FOUR
    // serving tiers publish directly comparable req/s. Eligibility is
    // MANDATORY on this tier, so the probe serves the realistic
    // filtered workload (parity keep sets, 50% selectivity) with the
    // relation REBUILT per micro-batch from the attributes frame —
    // the standing-deployment shape (keepPairsPer), priced end to
    // end. Numbers recorded in SCALING.md ("ANN serving probe").
    locally {
      val emb = Tables.embeddings(spark, sfDir)
      val hDocs = Tables.documents(spark, sfDir).select($"doc_id", $"text")
      val pIdx = java.nio.file.Files.createTempDirectory("sbench-hyb-post").toString
      val vIdx = java.nio.file.Files.createTempDirectory("sbench-hyb-ivfpq").toString
      graft.queries.SearchOps.writePostingsIndex(hDocs, pIdx)
      graft.queries.VectorOps.writeIvfPqIndex(emb, vIdx)
      val (nReq, rStage) = stageRequests(emb, "reqs-sbench-hyb")
      // per-batch eligibility: each request sees only its own parity's
      // doc ids — a 2-key equi-join relation build, never a cross
      val ids = hDocs.select($"doc_id", ($"doc_id" % 2).as("par"))
      val keepPer = (batch: org.apache.spark.sql.DataFrame) =>
        batch.select($"query_id", ($"query_id" % 2).as("par"))
          .join(ids, "par").select($"query_id", $"doc_id")
      val out = java.nio.file.Files.createTempDirectory("serve-sbench-hyb").toString
      val t0 = System.nanoTime()
      val q = Streams.hybridServeStream(
        spark.readStream.schema("query_id LONG, embedding ARRAY<FLOAT>")
          .option("maxFilesPerTrigger", "2").parquet(rStage),
        pIdx, vIdx, Seq("spark", "join", "window"), out,
        java.nio.file.Files.createTempDirectory("ckpt-sbench-hyb").toString,
        trigger = Some(Trigger.AvailableNow()),
        keepPairsPer = Some(keepPer))
      q.awaitTermination()
      val secs = (System.nanoTime() - t0) / 1e9
      val answered = spark.read.option("basePath", out).parquet(out)
        .select($"query_id").distinct().count()
      println(
        s"""{"metric":"hybrid_serve_requests_per_sec","value":${(nReq / secs).toLong},""" +
          s""""unit":"requests/sec","requests":$nReq,"answered":$answered,""" +
          s""""secs":$secs,"sf":"$sfDir"}""")
    }
    spark.stop()
  }
}
