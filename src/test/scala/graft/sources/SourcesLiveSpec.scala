package graft.sources

import java.io.PrintWriter
import java.net.ServerSocket

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.model.{MarketingUserBehavior, UserBehavior}

/** Live execution of the non-file sources that CAN run in this sandbox
  * (unlike Kafka, the socket and rate sources ship with Spark itself):
  * S3 drives a real TCP round-trip through the socket source into the
  * shared CSV parse half; S4 runs the deterministic rate-source
  * generator and checks its domains.
  */
class SourcesLiveSpec extends SparkSpec {

  test("socket source: TCP lines flow through the shared CSV parse half (S3 executed)") {
    val lines = scala.io.Source
      .fromFile(s"$refBase/HotItemsAnalysis/src/main/resources/UserBehaviorTest.csv")
      .getLines()
      .toVector
    val server = new ServerSocket(0) // ephemeral port
    val port = server.getLocalPort
    val writer = new Thread(() => {
      // accept Spark's client connection, stream the fixture, keep the
      // socket open until the test closes the server (the source treats
      // EOF as termination)
      val sock = server.accept()
      val out = new PrintWriter(sock.getOutputStream, true)
      lines.foreach(out.println)
      out.flush()
    })
    writer.setDaemon(true)
    writer.start()

    import spark.implicits._
    val parsed = scala.collection.mutable.ArrayBuffer.empty[UserBehavior]
    val q = Fixtures
      .csvLines(Fixtures.socketLines(spark, "localhost", port), Fixtures.userBehaviorSchema)
      .as[UserBehavior]
      .writeStream
      .outputMode("append")
      .foreachBatch { (b: org.apache.spark.sql.Dataset[UserBehavior], _: Long) =>
        val rows = b.collect()
        parsed.synchronized { parsed ++= rows }
        ()
      }
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("ckpt-socket").toString)
      .start()
    try {
      val deadline = System.nanoTime() + 60L * 1000 * 1000 * 1000
      while (parsed.synchronized(parsed.length) < lines.length && System.nanoTime() < deadline) {
        q.processAllAvailable()
        Thread.sleep(100)
      }
    } finally {
      q.stop()
      server.close()
    }

    val batch = Fixtures
      .userBehavior(spark, s"$refBase/HotItemsAnalysis/src/main/resources/UserBehaviorTest.csv")
      .collect()
    assert(parsed.sortBy(e => (e.timestamp, e.userId)).toSeq ===
      batch.sortBy(e => (e.timestamp, e.userId)).toSeq)
    assert(parsed.nonEmpty)
  }

  test("rate-source marketing generator: runs live, deterministic domains (S4 executed)") {
    import spark.implicits._
    val rows = scala.collection.mutable.ArrayBuffer.empty[MarketingUserBehavior]
    val q = Fixtures
      .marketingGenerator(spark, rowsPerSec = 500)
      .writeStream
      .outputMode("append")
      .foreachBatch { (b: org.apache.spark.sql.Dataset[MarketingUserBehavior], _: Long) =>
        val got = b.collect()
        rows.synchronized { rows ++= got }
        ()
      }
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("ckpt-rate").toString)
      .start()
    try {
      val deadline = System.nanoTime() + 30L * 1000 * 1000 * 1000
      while (rows.synchronized(rows.length) < 100 && System.nanoTime() < deadline) {
        q.processAllAvailable()
        Thread.sleep(100)
      }
    } finally q.stop()

    val got = rows.synchronized(rows.toVector)
    assert(got.length >= 100, s"rate source produced only ${got.length} rows")
    assert(got.forall(r => r.userId >= 0 && r.userId < 1000000L))
    assert(got.map(_.behavior).toSet.subsetOf(Set("CLICK", "DOWNLOAD", "INSTALL", "UNINSTALL")))
    assert(got.map(_.channel).toSet.subsetOf(Set("app store", "wechat", "weibo")))
    // hash-mixed, not constant: a window of rows spans several behaviors
    assert(got.map(_.behavior).distinct.length >= 2)
  }
}
