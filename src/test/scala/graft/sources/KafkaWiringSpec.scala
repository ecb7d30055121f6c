package graft.sources

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.model.UserBehavior

/** The Kafka wiring, exercised as far as this sandbox allows.
  *
  * There is no Kafka broker here AND no spark-sql-kafka connector jar on
  * the classpath (zero-egress container; the connector is not part of the
  * Spark distribution's jars/). So the `format("kafka")` load/save
  * themselves cannot run — the specs below pin everything AROUND that
  * hole instead:
  *
  *   1. the exact reader options [[Fixtures.kafkaCsv]] wires (the
  *      reference's HotItems.java:51-58 consumer config equivalents),
  *   2. that the consumer and producer paths reach Spark's DataSource
  *      resolution under the `kafka` format name — i.e. the wiring is
  *      real and the MISSING CONNECTOR is the only gap, and
  *   3. the full parse pipeline downstream of Kafka's
  *      `CAST(value AS STRING)` (byte values → from_csv → typed rows),
  *      end-to-end over a streaming MemoryStream of Kafka-shaped rows.
  */
class KafkaWiringSpec extends SparkSpec {

  test("kafkaCsv wires the reference consumer's exact reader options") {
    val opts = Fixtures.kafkaOptions("broker1:9092,broker2:9092", "hotitems")
    assert(opts === Map(
      "kafka.bootstrap.servers" -> "broker1:9092,broker2:9092",
      "subscribe" -> "hotitems",
      "startingOffsets" -> "latest"))
  }

  test("consumer path reaches DataSource resolution: only the connector jar is missing") {
    val e = intercept[Exception] {
      Fixtures.kafkaCsv(spark, "localhost:9092", "t", Fixtures.userBehaviorSchema)
    }
    // Spark's error for an unresolvable format names it verbatim — proof
    // the reader asked for the `kafka` source (and a canary that starts
    // failing if a connector jar ever appears, at which point this spec
    // should be upgraded to an embedded-broker test)
    assert(e.getMessage.toLowerCase.contains("kafka"), e.getMessage)
    assert(
      e.getMessage.contains("Failed to find") || e.getMessage.contains("DATA_SOURCE_NOT_FOUND"),
      e.getMessage)
  }

  test("producer path reaches DataSource resolution the same way") {
    val e = intercept[Exception] {
      Fixtures.linesToKafka(
        spark,
        s"$refBase/HotItemsAnalysis/src/main/resources/UserBehaviorTest.csv",
        "localhost:9092",
        "t")
    }
    assert(e.getMessage.toLowerCase.contains("kafka"), e.getMessage)
  }

  test("csv parse half consumes Kafka-shaped binary values end-to-end (streaming)") {
    import spark.implicits._
    // Kafka delivers `value: binary`; replay the reference fixture's lines
    // as UTF-8 bytes through a MemoryStream and run the REAL parse half
    val lines = scala.io.Source
      .fromFile(s"$refBase/HotItemsAnalysis/src/main/resources/UserBehaviorTest.csv")
      .getLines()
      .toVector
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[Array[Byte]]
    val parsed = scala.collection.mutable.ArrayBuffer.empty[UserBehavior]
    val q = Fixtures
      .csvLines(mem.toDF().select(col("value")), Fixtures.userBehaviorSchema)
      .as[UserBehavior]
      .writeStream
      .outputMode("append")
      .foreachBatch { (b: org.apache.spark.sql.Dataset[UserBehavior], _: Long) =>
        val rows = b.collect()
        parsed.synchronized { parsed ++= rows }
        ()
      }
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("ckpt-kafka-parse").toString)
      .start()
    try {
      mem.addData(lines.map(_.getBytes("UTF-8")))
      q.processAllAvailable()
    } finally q.stop()

    val batch = Fixtures
      .userBehavior(spark, s"$refBase/HotItemsAnalysis/src/main/resources/UserBehaviorTest.csv")
      .collect()
    assert(parsed.sortBy(e => (e.timestamp, e.userId)).toSeq ===
      batch.sortBy(e => (e.timestamp, e.userId)).toSeq)
    assert(parsed.nonEmpty)
  }
}
