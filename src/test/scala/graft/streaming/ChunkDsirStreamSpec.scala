package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.queries.TextOps

/** Live batch↔streaming parity for the two stateless ingest twins added
  * with t_chunk / t_dsir_weight: the SAME operator cores run over a
  * MemoryStream must emit exactly the batch rows (chunking is a pure
  * projection; DSIR scoring against a frozen model is a pure
  * lookup+fold — neither holds state, so parity is row-exact, not
  * approximate).
  */
class ChunkDsirStreamSpec extends SparkSpec {

  private def ckpt(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"ckpt-$tag").toString

  test("chunkStream emits exactly the batch chunk rows, append mode, no state") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val docsIn = Seq(
      (1L, (1 to 50).map(i => s"a$i").mkString(" ")),
      (2L, "short doc"),
      (3L, ""))
    val mem = MemoryStream[(Long, String)]
    val seen = scala.collection.mutable.ArrayBuffer.empty[Seq[Any]]
    val q = Streams.chunkStream(mem.toDF().toDF("doc_id", "text"))
      .writeStream
      .outputMode("append")
      .foreachBatch { (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        seen.synchronized { seen ++= b.collect().map(_.toSeq) }
        ()
      }
      .option("checkpointLocation", ckpt("chunk"))
      .start()
    try {
      mem.addData(docsIn)
      q.processAllAvailable()
    } finally q.stop()
    val batch = TextOps.chunksOf(docsIn.toDF("doc_id", "text")).collect().map(_.toSeq)
    assert(seen.toSet === batch.toSet)
    assert(seen.size === batch.length)
  }

  test("dsirScoreStream against the frozen batch model reproduces batch scores") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val corpus = Seq(
      (0L, "alpha beta alpha", true),
      (1L, "beta alpha beta beta", true),
      (2L, "gamma delta gamma", false),
      (3L, "delta gamma delta delta", false))
    val corpusDf = corpus.toDF("doc_id", "text", "is_t")
    // fit offline...
    val (model, defaultPpm) = TextOps.dsirModelOf(corpusDf, col("is_t"))
    val batch = TextOps.dsirWeightsOn(corpusDf, col("is_t"))
      .collect().map(_.toSeq).toSet
    // ...score online: the same docs arriving as a stream
    val mem = MemoryStream[(Long, String)]
    val seen = scala.collection.mutable.ArrayBuffer.empty[Seq[Any]]
    val q = Streams.dsirScoreStream(
        mem.toDF().toDF("doc_id", "text"), model, defaultPpm)
      .writeStream
      .outputMode("append")
      .foreachBatch { (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        seen.synchronized { seen ++= b.collect().map(_.toSeq) }
        ()
      }
      .option("checkpointLocation", ckpt("dsir"))
      .start()
    try {
      mem.addData(corpus.map { case (id, text, _) => (id, text) })
      q.processAllAvailable()
      // an unseen token prices at the default (smoothed zero-count ratio)
      mem.addData(Seq((9L, "neverseen")))
      q.processAllAvailable()
    } finally q.stop()
    val (novel, known) = seen.partition(_.head == 9L)
    assert(known.toSet === batch)
    assert(novel === Seq(Seq(9L, 1L, defaultPpm, defaultPpm)))
  }
}
