package graft.streaming

import graft.SparkSpec
import graft.queries.{SearchOps, VectorOps}
import graft.sources.IndexManifest
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** The generic single-family ingest stream: every micro-batch is at
  * most one committed epoch, a replayed landed batch never
  * double-appends, and a crash in the stage-but-not-advanced window
  * re-runs idempotently — drilled on the postings family (the widest
  * appender: bucket-partitioned slices + rewrite stats) and smoke-run
  * on BQ to show the appender parameter is really generic.
  */
class IndexIngestSpec extends SparkSpec {

  import spark.implicits._

  // fully-qualified file:// URIs: index roots, ledger roots and
  // checkpoints all resolve through the Hadoop-FS control plane
  private def tmp(p: String) =
    "file://" + java.nio.file.Files.createTempDirectory(p).toString

  private val dayOne = Seq(
    1L -> "spark join window spark filter",
    2L -> "join window shuffle state")
  private val dayTwo = Seq(3L -> "spark spark spark join")
  private val dayThree = Seq(4L -> "window window join spark stream")
  private val terms = Seq("spark", "join", "window")

  private def search(dir: String) =
    SearchOps.bm25SearchFromIndex(spark, dir, terms, 10)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toSeq

  private def postingsEpoch(dir: String) =
    IndexManifest.committedEpoch(dir, IndexManifest.Postings)

  test("standing postings ingest: one epoch per batch, ranking equals the batch-built twin") {
    implicit val sqlCtx = spark.sqlContext
    val live = tmp("iing-live"); val twin = tmp("iing-twin")
    SearchOps.writePostingsIndex(dayOne.toDF("doc_id", "text"), live)

    val mem = MemoryStream[(Long, String)]
    val q = Streams.indexIngestStream(
      mem.toDF().toDF("doc_id", "text"),
      () => postingsEpoch(live),
      SearchOps.appendPostingsIndex(_, live),
      tmp("iing-ckpt"))
    try {
      mem.addData(dayTwo)
      q.processAllAvailable()
      assert(postingsEpoch(live) === 1L)
      mem.addData(dayThree)
      q.processAllAvailable()
      assert(postingsEpoch(live) === 2L)
    } finally q.stop()

    SearchOps.writePostingsIndex(
      (dayOne ++ dayTwo ++ dayThree).toDF("doc_id", "text"), twin)
    assert(search(live) === search(twin),
      "streamed appends must rank exactly like a one-shot build over everything")
  }

  test("replay of a landed batch is a no-op; a marker-then-crash batch re-runs once") {
    val dir = tmp("iing-replay")
    SearchOps.writePostingsIndex(dayOne.toDF("doc_id", "text"), dir)
    val ledger = tmp("iing-ledger")
    val delta = dayTwo.toDF("doc_id", "text")
    val epoch = () => postingsEpoch(dir)
    val append = SearchOps.appendPostingsIndex(_: org.apache.spark.sql.DataFrame, dir)

    Streams.applyIndexIngestBatch(delta, epoch, append, ledger, 0L)
    assert(epoch() === 1L)
    // offsets lost after the append committed: the marker (pre=0) is
    // below the committed epoch, so the replay must skip
    Streams.applyIndexIngestBatch(delta, epoch, append, ledger, 0L)
    assert(epoch() === 1L, "a replayed landed batch must not append again")

    // crash window: the marker persists and the epoch STAGES, but the
    // manifest never advances (the appender's two halves, torn apart)
    val crash = intercept[RuntimeException] {
      Streams.applyIndexIngestBatch(dayThree.toDF("doc_id", "text"), epoch,
        d => {
          SearchOps.stagePostingsAppend(d, dir, epoch() + 1L)
          throw new RuntimeException("planted crash before advance")
        }, ledger, 1L)
    }
    assert(crash.getMessage.contains("planted crash"))
    assert(epoch() === 1L, "the torn append must not be visible")
    // the stream restarts and replays batch 1 with the REAL appender:
    // marker == committed epoch → re-run; re-staging epoch 2 overwrites
    Streams.applyIndexIngestBatch(dayThree.toDF("doc_id", "text"), epoch,
      append, ledger, 1L)
    assert(epoch() === 2L)
    val twin = tmp("iing-replay-twin")
    SearchOps.writePostingsIndex(
      (dayOne ++ dayTwo ++ dayThree).toDF("doc_id", "text"), twin)
    assert(search(dir) === search(twin),
      "after the healed replay the ranking equals the from-scratch twin")

    // markers prune as batches settle
    Streams.applyIndexIngestBatch(spark.emptyDataFrame, epoch, append, ledger, 2L)
    import graft.sources.LedgerIO
    assert(!LedgerIO.exists(LedgerIO.child(ledger, "batch-0.epoch")))
    assert(!LedgerIO.exists(LedgerIO.child(ledger, "batch-1.epoch")))
    assert(epoch() === 2L, "an empty batch must not commit an epoch")
  }

  test("a foreign writer advancing the index mid-stream fails loudly, never a silent skip") {
    val dir = tmp("iing-foreign")
    SearchOps.writePostingsIndex(dayOne.toDF("doc_id", "text"), dir)
    val ledger = tmp("iing-foreign-ledger")
    val epoch = () => postingsEpoch(dir)
    val append = SearchOps.appendPostingsIndex(_: org.apache.spark.sql.DataFrame, dir)

    Streams.applyIndexIngestBatch(dayTwo.toDF("doc_id", "text"), epoch, append, ledger, 0L)
    assert(epoch() === 1L)
    // an EXTERNAL append lands while the stream's offsets are unflushed
    // (the single-writer contract broken out-of-band)...
    SearchOps.appendPostingsIndex(dayThree.toDF("doc_id", "text"), dir)
    assert(epoch() === 2L)
    // ...so the replay of batch 0 can no longer tell its own commit
    // from the foreign one by epoch arithmetic: committed (2) is past
    // marker+1. The old body silently skipped here — now it throws,
    // naming the foreign epoch, and nothing moves.
    val ex = intercept[java.util.ConcurrentModificationException] {
      Streams.applyIndexIngestBatch(dayTwo.toDF("doc_id", "text"), epoch, append, ledger, 0L)
    }
    assert(ex.getMessage.contains("single-writer violation") &&
      ex.getMessage.contains("epoch 2"))
    assert(epoch() === 2L, "the violation must not append anything")
  }

  test("the appender parameter is generic: BQ family streams through the same body") {
    val rnd = new scala.util.Random(71)
    def vec() = Array.fill(64)(rnd.nextGaussian().toFloat)
    val dir = tmp("iing-bq")
    VectorOps.writeBqIndex(
      spark.createDataset((0L until 8L).map(i => (i, vec()))).toDF("vec_id", "embedding"), dir)
    val ledger = tmp("iing-bq-ledger")
    val epoch = () => IndexManifest.committedEpoch(dir, IndexManifest.Bq)
    val delta = spark.createDataset(Seq((100L, vec()))).toDF("vec_id", "embedding")
    Streams.applyIndexIngestBatch(delta,
      epoch, VectorOps.appendBqIndex(_, dir), ledger, 0L)
    assert(epoch() === 1L)
    Streams.applyIndexIngestBatch(delta,
      epoch, VectorOps.appendBqIndex(_, dir), ledger, 0L)
    assert(epoch() === 1L)
  }
}
