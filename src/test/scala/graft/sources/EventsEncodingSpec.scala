package graft.sources

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The events `ts` column has shipped as TIMESTAMP(NANOS)-read-as-Long and
  * as TIMESTAMP_NTZ micros (the round-11 regen broke every events query
  * for a round). This canary drives BOTH physical encodings of the same
  * instants through Tables.events/eventsTimed and pins that the derived
  * ts_sec/event_time agree — if the generator ships a third encoding,
  * this fails in `sbt test` instead of zeroing the round's correctness.
  */
class EventsEncodingSpec extends SparkSpec {

  private val secs = Seq(0L, 1L, 1704067199L, 1704067200L, 4102444800L)

  private def writeAndLoad(dir: String, tsCol: org.apache.spark.sql.Column): Unit = {
    import spark.implicits._
    secs.zipWithIndex
      .map { case (s, i) => (i.toLong, s, i.toLong, "view", 1.0, "{}") }
      .toDF("event_id", "sec", "user_id", "event_type", "value", "props")
      .withColumn("ts", tsCol)
      .drop("sec")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
  }

  test("Long-nanos and TIMESTAMP_NTZ encodings derive identical ts_sec and event_time") {
    import spark.implicits._
    val longDir = java.nio.file.Files.createTempDirectory("ev-long").toString
    val ntzDir = java.nio.file.Files.createTempDirectory("ev-ntz").toString
    // epoch-nanos Long (what nanosAsLong yields from TIMESTAMP(NANOS))
    writeAndLoad(longDir, (col("sec") * 1000000000L).cast("long"))
    // TIMESTAMP_NTZ micros (the current generator's encoding)
    writeAndLoad(ntzDir, timestamp_seconds(col("sec")).cast("timestamp_ntz"))

    def secsOf(dir: String): Map[Long, Long] =
      Tables.events(spark, dir).select($"event_id", $"ts_sec")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    def timesOf(dir: String): Map[Long, Long] =
      Tables.eventsTimed(spark, dir)
        .select($"event_id", unix_micros($"event_time").as("us"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

    val want = secs.zipWithIndex.map { case (s, i) => i.toLong -> s }.toMap
    assert(secsOf(longDir) === want, "Long-nanos path drifted")
    assert(secsOf(ntzDir) === want, "TIMESTAMP_NTZ path drifted")
    assert(timesOf(longDir) === want.view.mapValues(_ * 1000000L).toMap)
    assert(timesOf(ntzDir) === want.view.mapValues(_ * 1000000L).toMap)
    // ts stays orderable in both encodings (the only raw-ts use in the
    // catalog is intra-key ORDER BY)
    val orderedLong = Tables.events(spark, longDir).orderBy($"ts").select($"event_id")
      .collect().map(_.getLong(0)).toSeq
    val orderedNtz = Tables.events(spark, ntzDir).orderBy($"ts").select($"event_id")
      .collect().map(_.getLong(0)).toSeq
    assert(orderedLong === orderedNtz)
  }
}
