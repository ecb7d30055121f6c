package graft.queries

import graft.SparkSpec
import graft.sources.IndexManifest

/** The cascade pair's coverage lifecycle: the audit must see a planted
  * half-append, the paired durable append must crash-resume from disk
  * alone and restore coverage, and replay must never double-append.
  */
class CascadePairSpec extends SparkSpec {

  private val rnd = new scala.util.Random(417)
  private def vec(): Array[Float] = Array.fill(64)(rnd.nextGaussian().toFloat)
  private def tmp(p: String) = java.nio.file.Files.createTempDirectory(p).toString

  private def df(rows: Seq[(Long, Array[Float])]) = {
    import spark.implicits._
    spark.createDataset(rows).toDF("vec_id", "embedding")
  }

  private def audit(bq: String, sq: String): (Long, Long, Long) = {
    val r = VectorOps.cascadeCoverageAudit(spark, bq, sq).collect().head
    (r.getLong(0), r.getLong(1), r.getLong(2))
  }

  private def buildPair(n: Long): (String, String) = {
    val base = (0L until n).map(i => (i, vec()))
    val bq = tmp("cpair-bq"); val sq = tmp("cpair-sq8")
    VectorOps.writeBqIndex(df(base), bq)
    VectorOps.writeSq8Index(df(base), sq)
    (bq, sq)
  }

  test("healthy pair audits (corpus, 0, 0); divergence in either direction is counted") {
    val (bq, sq) = buildPair(40L)
    assert(audit(bq, sq) === ((40L, 0L, 0L)))
    // a bare single-tier append (the unpaired path) diverges bq-ward
    VectorOps.appendBqIndex(df(Seq((100L, vec()), (101L, vec()))), bq)
    assert(audit(bq, sq) === ((40L, 2L, 0L)))
    // and a tombstone applied to only one tier diverges the other way
    VectorOps.deleteFromBqIndex(df(Seq((3L, vec()))).select("vec_id"), bq)
    assert(audit(bq, sq) === ((39L, 2L, 1L)))
  }

  test("paired append: crash between the BQ and SQ8 appends, disk-only resume restores coverage") {
    val (bq, sq) = buildPair(30L)
    val root = tmp("cpair-intent")
    val delta = (500L until 505L).map(i => (i, vec()))
    // failAfter = 1: the BQ append commits, then the planted crash
    // fires exactly in the divergence window
    val ex = intercept[RuntimeException] {
      VectorOps.appendCascadeDurable(df(delta), bq, sq, root, failAfter = 1)
    }
    assert(ex.getMessage.contains("planted crash"))
    // the half-appended state is live, observable, and unservable
    assert(audit(bq, sq) === ((30L, 5L, 0L)))
    assert(IndexManifest.committedEpoch(bq, IndexManifest.Bq) === 1L)
    assert(IndexManifest.committedEpoch(sq, IndexManifest.Sq8) === 0L)
    // a second paired append must refuse while the intent is pending
    val busy = intercept[IllegalArgumentException] {
      VectorOps.appendCascadeDurable(df(Seq((900L, vec()))), bq, sq, root)
    }
    assert(busy.getMessage.contains("pending cascade-append intent"))
    // disk-only resume: the BQ tier's epoch advanced past its snapshot
    // (done — must NOT double-append), the SQ8 tier replays its stage
    VectorOps.resumeAppendCascade(spark, root)
    assert(audit(bq, sq) === ((35L, 0L, 0L)))
    assert(IndexManifest.committedEpoch(bq, IndexManifest.Bq) === 1L)
    assert(IndexManifest.committedEpoch(sq, IndexManifest.Sq8) === 1L)
    // settled: nothing left to resume, and the next paired append runs
    val done = intercept[IllegalArgumentException] {
      VectorOps.resumeAppendCascade(spark, root)
    }
    assert(done.getMessage.contains("nothing to resume"))
    VectorOps.appendCascadeDurable(df(Seq((600L, vec()))), bq, sq, root)
    assert(audit(bq, sq) === ((36L, 0L, 0L)))
  }

  test("crash BEFORE any tier append: the persisted intent replays both tiers") {
    val (bq, sq) = buildPair(20L)
    val root = tmp("cpair-intent0")
    intercept[RuntimeException] {
      VectorOps.appendCascadeDurable(df(Seq((700L, vec()), (701L, vec()))),
        bq, sq, root, failAfter = 0)
    }
    assert(audit(bq, sq) === ((20L, 0L, 0L)))
    VectorOps.resumeAppendCascade(spark, root)
    assert(audit(bq, sq) === ((22L, 0L, 0L)))
  }

  test("served set equals the audit's both_tiers after heal (the coverage contract end to end)") {
    import spark.implicits._
    graft.functions.GraftFunctions.registerDotD(spark)
    val base = (0L until 25L).map(i => (i, vec()))
    val bq = tmp("cpair-e2e-bq"); val sq = tmp("cpair-e2e-sq8")
    VectorOps.writeBqIndex(df(base), bq)
    VectorOps.writeSq8Index(df(base), sq)
    val root = tmp("cpair-e2e-intent")
    val twin = (0 until 3).map(i => (800L + i, base(i)._2.map(x => x + 1e-4f)))
    intercept[RuntimeException] {
      VectorOps.appendCascadeDurable(df(twin), bq, sq, root, failAfter = 1)
    }
    val corpus = df(base ++ twin)
    def served(): Set[Long] = {
      val req = df(base.take(3).map { case (i, v) => (9000L + i, v) })
        .select($"vec_id".as("query_id"), $"embedding")
      VectorOps.searchCascadeIndex(req, bq, sq, corpus, k = 3L)
        .select($"cand_id").as[Long].collect().toSet
    }
    // half-appended twins are screened but have no codes row — the
    // fail-closed drop keeps them unservable
    assert(served().intersect(Set(800L, 801L, 802L)).isEmpty)
    VectorOps.resumeAppendCascade(spark, root)
    // healed: each twin is its query's nearest stored vector
    assert(Set(800L, 801L, 802L).subsetOf(served()))
  }
}
