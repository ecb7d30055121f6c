package graft.streaming

import graft.SparkSpec
import graft.queries.{Catalog, CurationOps}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** The standing weighted sample must equal the batch row at every
  * cut-off: after each micro-batch the emitted k-element sample is
  * exactly the batch draw over the rows ingested so far (the min-key
  * monoid argument), and the final state reproduces `t_weighted_sample`
  * verbatim.
  */
class WeightedSampleStreamSpec extends SparkSpec {

  import spark.implicits._

  private val sf = "/root/testdata/sf0.01"

  private def batchDraw(docs: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
    CurationOps.weightedDrawKeyed(docs)
      .orderBy($"draw_key".asc, $"doc_id".asc).limit(CurationOps.weightedK)
      .select($"doc_id", $"draw_key")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  test("streamed sample equals the batch draw at every cut-off and t_weighted_sample at the end") {
    implicit val sqlCtx = spark.sqlContext
    val all = spark.read.parquet(s"$sf/documents.parquet")
      .select($"doc_id", $"lang")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    val (h1, h2) = all.partition(_._1 % 2 == 0)

    val mem = MemoryStream[(Long, String)]
    @volatile var latest = Set.empty[(Long, Long)]
    val q = Streams.weightedSampleStream(mem.toDF().toDF("doc_id", "lang"))
      .writeStream
      .outputMode("update")
      .foreachBatch { (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        val rows = Streams.weightedSampleOf(b)
          .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
        if (rows.nonEmpty) latest = rows
        ()
      }
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("ckpt-wsample").toString)
      .start()
    try {
      mem.addData(h1)
      q.processAllAvailable()
      assert(latest === batchDraw(h1.toDF("doc_id", "lang")),
        "mid-stream the sample is the batch draw over exactly the rows seen")
      mem.addData(h2)
      q.processAllAvailable()
      val fin = Catalog.queries("t_weighted_sample")(spark, sf)
        .select($"doc_id", $"draw_key")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(latest === fin,
        "at end-of-stream the standing sample IS t_weighted_sample")
      assert(latest.size === CurationOps.weightedK)
    } finally q.stop()
  }

  test("change-suppressing sink: redelivery-heavy ingest writes fewer batches, final sample unchanged") {
    implicit val sqlCtx = spark.sqlContext
    import java.nio.file.{Files, Paths}
    val all = spark.read.parquet(s"$sf/documents.parquet")
      .select($"doc_id", $"lang")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    val (h1, h2) = all.partition(_._1 % 2 == 0)

    val mem = MemoryStream[(Long, String)]
    val out = Files.createTempDirectory("wsample-out").toString
    val ckpt = Files.createTempDirectory("wsample-chg-ckpt").toString
    val q = Streams.weightedSampleChangedStream(
      mem.toDF().toDF("doc_id", "lang"), out, ckpt)
    try {
      mem.addData(h1); q.processAllAvailable()           // batch 0: first sample
      mem.addData(h1.take(h1.size / 2)); q.processAllAvailable() // pure redelivery
      mem.addData(h1.take(10)); q.processAllAvailable()  // more redelivery
      mem.addData(h2); q.processAllAvailable()           // genuine displacement
    } finally q.stop()

    // 4 non-empty batches, but only the two MEMBERSHIP changes landed:
    // the aggregator's duplicate no-op keeps the k-set fixed under
    // redelivery and the fingerprint sink suppresses those emissions
    val dirs = {
      import scala.jdk.CollectionConverters._
      scala.util.Using.resource(Files.list(Paths.get(out)))(
        _.iterator().asScala.map(_.getFileName.toString)
          .filter(_.startsWith("batch=")).toVector.sorted)
    }
    assert(dirs === Vector("batch=0", "batch=3"),
      s"redelivered batches must be suppressed, got $dirs")

    // the LATEST written batch is t_weighted_sample over everything
    val fin = Catalog.queries("t_weighted_sample")(spark, sf)
      .select($"doc_id", $"draw_key")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val latest = Streams.weightedSampleOf(
      spark.read.parquet(s"$out/batch=3"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(latest === fin, "suppression must never change the sample itself")
  }
}
