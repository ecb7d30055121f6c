package graft.multimodal

import graft.SparkSpec
import graft.queries.Catalog

/** Overlapping-window audio fingerprint probes: a local edit costs at
  * most window/hop (= 2) window digests, a hop-aligned trim keeps every
  * remaining digest (the shift-invariance fixed frames cannot give), and
  * the operator equals a brute-force containment recount.
  */
class AudioNearDupSpec extends SparkSpec {

  private def clip(id: Long, bytes: Array[Byte]) =
    Multimodal.MediaAsset(id, "audio", bytes, "wav", 0, 0, 16000, 5000L)

  test("window digests: local edit costs <= 2 windows; hop-aligned trim keeps the rest") {
    import spark.implicits._
    val rnd = new scala.util.Random(13)
    val base = Array.fill[Byte](2048)(rnd.nextInt().toByte)
    val edited = base.clone(); edited(640) = (edited(640) ^ 0x80).toByte
    val ds = spark.createDataset(Seq(
      clip(0, base), clip(1, edited), clip(2, base.drop(128))))
    val d = Multimodal.audioWindowDigests(ds).collect()
      .groupBy(_.assetId).view.mapValues(_.sortBy(_.winIdx).map(_.winDigest).toSeq).toMap
    assert(d(0).length === 15)
    val changed = d(0).zip(d(1)).zipWithIndex.collect { case ((a, b), i) if a != b => i }
    assert(changed === Seq(4, 5), s"byte 640 lives in windows 4 and 5, got $changed")
    assert(d(2) === d(0).drop(1), "hop-aligned trim must keep every remaining window digest")
    // sub-window payload hashes whole as one window
    val tiny = Multimodal.audioWindowDigests(
      spark.createDataset(Seq(clip(3, base.take(100))))).collect()
    assert(tiny.length === 1)
  }

  test("m_audio_neardup equals a brute-force containment recount; planted pairs found") {
    val out = Catalog.queries("m_audio_neardup")(spark, "unused").collect()
      .map(r => (r.getAs[Long]("asset_a"), r.getAs[Long]("asset_b"),
        r.getAs[Long]("n_shared"), r.getAs[Long]("containment_pct")))
      .toSet
    val digests = Multimodal.audioWindowDigests(
      spark.read.parquet(graft.sources.Fixtures.fixturesDir + "/media_audio_variants.parquet")
        .as[Multimodal.MediaAsset](org.apache.spark.sql.Encoders.product))
      .collect()
      .groupBy(_.assetId).view.mapValues(_.map(_.winDigest).toSet).toMap
    val ids = digests.keys.toSeq.sorted
    val brute = (for {
      a <- ids.iterator
      b <- ids if a < b
      shared = (digests(a) & digests(b)).size.toLong
      minN = math.min(digests(a).size, digests(b).size).toLong
      if shared * 5 >= minN * 3
    } yield (a, b, shared, math.floor(100.0 * shared / minN).toLong)).toSet
    assert(out === brute)
    for (i <- 0 until 10) {
      assert(out.contains((i.toLong, 200L + i, 13L, 86L)), s"edit pair $i")
      assert(out.contains((10L + i, 300L + i, 14L, 100L)), s"trim pair $i")
    }
    assert(out.size === 20, s"unrelated base clips must not pair: ${out.size}")
  }
}
