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
    val maxId = base.agg(max($"event_id")).first().getLong(0) + 1
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
    val totalRows = base.count() * replicas

    val schema = "event_id LONG, user_id LONG, event_type STRING, item LONG, ts_sec LONG"
    val outRows = new java.util.concurrent.atomic.AtomicLong(0)
    val t0 = System.nanoTime()
    val q = spark.readStream
      .schema(schema)
      .option("maxFilesPerTrigger", 8)
      .csv(stage)
      .withColumn("eventTime", timestamp_seconds(col("ts_sec")))
      .withWatermark("eventTime", "0 seconds")
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
    spark.stop()
  }
}
