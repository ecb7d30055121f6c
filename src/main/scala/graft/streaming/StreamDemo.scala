package graft.streaming

import org.apache.spark.sql.functions._

import graft.GraftSession
import graft.sources.Tables

/** One-command live demo: replays the synthetic `events` table as a
  * rate-limited stream and runs three of the engine's streaming operators
  * concurrently to the console — windowed counts per event type (update
  * mode), per-window top-5 items via foreachBatch re-rank, and streaming
  * HLL UV.
  *
  * Usage: `sbt "runMain graft.streaming.StreamDemo [sfDir] [seconds]"`.
  *
  * The replay writes the parquet rows out as a directory of small CSV
  * chunks and streams them back with maxFilesPerTrigger — the same
  * file-replay harness the specs use, no external broker needed.
  */
object StreamDemo {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val runSecs = args.lift(1).map(_.toInt).getOrElse(15)
    val spark = GraftSession.local("graft-stream-demo", "8")
    import spark.implicits._

    // stage the events as replayable chunks
    val stage = java.nio.file.Files.createTempDirectory("events-replay").toString
    Tables
      .events(spark, sfDir)
      .withColumn("item", regexp_extract(col("props"), "(\\d+)", 1).cast("long"))
      .select($"event_id", $"user_id", $"event_type", $"item", $"ts_sec")
      .repartition(20)
      .write.mode("overwrite").csv(stage)

    val schema = "event_id LONG, user_id LONG, event_type STRING, item LONG, ts_sec LONG"
    val stream = spark.readStream
      .schema(schema)
      .option("maxFilesPerTrigger", 2)
      .csv(stage)
      .withColumn("eventTime", timestamp_seconds(col("ts_sec")))
      .withWatermark("eventTime", "0 seconds")

    val byType = stream
      .groupBy(window($"eventTime", "1 day"), $"event_type")
      .agg(count(lit(1)).as("cnt"))
      .select($"window.end".as("windowEnd"), $"event_type", $"cnt")
      .writeStream.outputMode("update").format("console")
      .option("truncate", "false").option("numRows", "8")
      .start()

    val topItems = stream
      .groupBy(window($"eventTime", "6 hours", "1 hour"), $"item")
      .agg(count(lit(1)).as("cnt"))
      .select(unix_timestamp($"window.end").as("windowEnd"), $"item", $"cnt")
      .writeStream.outputMode("update")
      .foreachBatch { (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], id: Long) =>
        val top = graft.operators.Windowed.topNPerWindow(b.toDF(), col("item"), 5)
        println(s"=== top items, batch $id (${top.count()} ranked rows across windows) ===")
        top.orderBy($"windowEnd".desc, $"rank").show(10, truncate = false)
      }
      .start()

    val uv = stream
      .groupBy(window($"eventTime", "1 day"))
      .agg(approx_count_distinct($"user_id", 0.01).as("uv"))
      .select($"window.end".as("windowEnd"), $"uv")
      .writeStream.outputMode("update").format("console")
      .option("truncate", "false").option("numRows", "5")
      .start()

    Thread.sleep(runSecs * 1000L)
    Seq(byType, topItems, uv).foreach(_.stop())
    spark.stop()
  }
}
