package graft.multimodal

import graft.SparkSpec
import graft.queries.Catalog

/** Frame-overlap video near-dup probes: digest locality (an edit inside
  * one frame's slice changes only that frame's digest; a tail-trim keeps
  * every remaining digest), and the operator's output checked against a
  * brute-force containment recount over the same digests.
  */
class VideoNearDupSpec extends SparkSpec {

  private def video(id: Long, bytes: Array[Byte], durMs: Long) =
    Multimodal.MediaAsset(id, "video", bytes, "mp4", 640, 480, 0, durMs)

  test("frame digests are per-slice: one edited frame, one changed digest") {
    import spark.implicits._
    val rnd = new scala.util.Random(9)
    val base = Array.fill[Byte](1000)(rnd.nextInt().toByte)
    val edited = base.clone(); edited(450) = (edited(450) ^ 0x80).toByte
    val ds = spark.createDataset(Seq(video(0, base, 5000), video(1, edited, 5000)))
    val d = Multimodal.videoFrameDigests(ds).collect()
      .groupBy(_.assetId).view.mapValues(_.sortBy(_.frameIdx).map(_.frameDigest)).toMap
    assert(d(0).length === 5 && d(1).length === 5)
    val diff = d(0).zip(d(1)).zipWithIndex.collect { case ((a, b), i) if a != b => i }
    assert(diff === Seq(2), s"only frame 2 may change, got $diff")
    // tail-trim keeps every remaining frame's digest
    val trimmed = Multimodal.videoFrameDigests(
      spark.createDataset(Seq(video(2, base, 3000)))).collect().sortBy(_.frameIdx)
    assert(trimmed.map(_.frameDigest).toSeq === d(0).take(3).toSeq)
  }

  test("m_video_neardup equals a brute-force containment recount; planted pairs found") {
    val out = Catalog.queries("m_video_neardup")(spark, "unused").collect()
      .map(r => (r.getAs[Long]("asset_a"), r.getAs[Long]("asset_b"),
        r.getAs[Long]("n_shared"), r.getAs[Long]("containment_pct")))
      .toSet
    val digests = Multimodal.videoFrameDigests(
      spark.read.parquet(graft.sources.Fixtures.fixturesDir + "/media_video_variants.parquet")
        .as[Multimodal.MediaAsset](org.apache.spark.sql.Encoders.product))
      .collect()
      .groupBy(_.assetId).view.mapValues(_.map(_.frameDigest).toSet).toMap
    val ids = digests.keys.toSeq.sorted
    val brute = (for {
      a <- ids.iterator
      b <- ids if a < b
      shared = (digests(a) & digests(b)).size.toLong
      minN = math.min(digests(a).size, digests(b).size).toLong
      if shared * 5 >= minN * 3
    } yield (a, b, shared, math.floor(100.0 * shared / minN).toLong)).toSet
    assert(out === brute)
    // planted: 10 re-encodes at 80% (4/5 frames), 10 tail-trims at 100% (4/4)
    for (i <- 0 until 10) {
      assert(out.contains((i.toLong, 200L + i, 4L, 80L)), s"re-encode pair $i")
      assert(out.contains((10L + i, 300L + i, 4L, 100L)), s"tail-trim pair $i")
    }
    assert(out.size === 20, s"unrelated base videos must not pair: ${out.size}")
  }
}
