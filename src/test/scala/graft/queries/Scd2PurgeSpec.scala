package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sources.IndexManifest

/** Purging a doc's whole history from the stored SCD2 table: erasure vs
  * closure semantics, the kill drill, re-add-after-purge (the old
  * tombstone must not touch the fresh history), and physical erasure on
  * compaction.
  */
class Scd2PurgeSpec extends SparkSpec {

  import spark.implicits._

  private def tmp(p: String) = java.nio.file.Files.createTempDirectory(p).toString

  private def hist(dir: String) =
    TextOps.readScd2(spark, dir).collect()
      .map(r => (r.getLong(0), r.getAs[Long]("version"), r.getAs[Long]("valid_from"),
        r.getAs[Long]("valid_to"), r.getAs[Boolean]("is_current"))).toSet

  test("purge erases history; killed purge invisible; re-add starts fresh; compaction physical") {
    val dir = tmp("scd2-purge")
    // doc 1: three versions across days 0-2; doc 2: stable
    TextOps.writeScd2(Seq((1L, "a"), (2L, "x")).toDF("doc_id", "text"), 0L, dir)
    TextOps.appendScd2Snapshot(Seq((1L, "b"), (2L, "x")).toDF("doc_id", "text"), 1L, dir)
    TextOps.appendScd2Snapshot(Seq((1L, "c"), (2L, "x")).toDF("doc_id", "text"), 2L, dir)
    assert(hist(dir).count(_._1 == 1L) === 3)

    // kill drill: a staged purge must not move reads
    TextOps.stageScd2Purge(Seq(1L).toDF("doc_id"), dir, 3L)
    assert(IndexManifest.committedEpoch(dir, IndexManifest.Scd2) === 2L)
    assert(hist(dir).count(_._1 == 1L) === 3, "uncommitted purge leaked")

    // committed purge: doc 1 was never here; doc 2 untouched
    TextOps.purgeScd2Docs(Seq(1L).toDF("doc_id"), dir)
    assert(hist(dir).forall(_._1 != 1L), "purge must erase every version")
    assert(hist(dir).count(_._1 == 2L) === 1)

    // the doc RE-ADDED by a later snapshot starts a fresh version-1
    // history the old tombstone cannot touch (epoch precedence)
    TextOps.appendScd2Snapshot(Seq((1L, "d"), (2L, "x")).toDF("doc_id", "text"), 3L, dir)
    TextOps.appendScd2Snapshot(Seq((1L, "e"), (2L, "x")).toDF("doc_id", "text"), 4L, dir)
    val h1 = hist(dir).filter(_._1 == 1L)
    assert(h1 === Set((1L, 1L, 3L, 3L, false), (1L, 2L, 4L, 4L, true)),
      s"fresh post-purge history expected, got $h1")

    // compaction: the purged rows are physically gone from the closed fold
    TextOps.compactScd2(spark, dir)
    val st = IndexManifest.committedState(dir, IndexManifest.Scd2)
    assert(st.baseEpoch === st.epoch)
    val rawClosed = spark.read.parquet(s"$dir/closed/epoch=${st.epoch}")
    assert(rawClosed.filter(col("doc_id") === 1L && col("valid_from") < 3L).count() === 0L,
      "pre-purge closed rows must be physically erased")
    assert(hist(dir).filter(_._1 == 1L) === h1)
    // still foldable after the compaction
    TextOps.appendScd2Snapshot(Seq((2L, "y")).toDF("doc_id", "text"), 5L, dir)
    assert(hist(dir).exists(t => t._1 == 2L && t._2 == 2L && t._5))
  }
}
