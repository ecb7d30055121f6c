package graft.multimodal

import graft.SparkSpec
import graft.queries.Catalog

/** Perceptual-hash near-dup probes: dHash locality (a sampled-cell edit
  * moves ≤ 2 bits per touched pixel; an unsampled "metadata" edit moves
  * none), and the banded operator's output checked against the
  * brute-force all-pairs Hamming set — the 8-band/8-bit split guarantees
  * recall for every pair within the ≤ 6 threshold, so banded == brute
  * force exactly.
  */
class ImageNearDupSpec extends SparkSpec {

  private def asset(id: Long, bytes: Array[Byte]) =
    Multimodal.MediaAsset(id, "image", bytes, "png", 640, 480, 0, 0L)

  test("dhash is locality-preserving: sampled edits move few bits, unsampled none") {
    val rnd = new scala.util.Random(5)
    val base = Array.fill[Byte](1024)(rnd.nextInt().toByte)
    val a = asset(0, base)
    // pixel i samples byte i*1024/72: byte 142 = pixel 10, byte 17 unsampled
    val visible = base.clone(); visible(142) = (visible(142) + 50).toByte
    val meta = base.clone(); meta(17) = (meta(17) + 50).toByte
    val h0 = Multimodal.StubCodec.dhash(a)
    val hVis = Multimodal.StubCodec.dhash(asset(1, visible))
    val hMeta = Multimodal.StubCodec.dhash(asset(2, meta))
    assert(java.lang.Long.bitCount(h0 ^ hVis) <= 2, "one pixel affects at most 2 comparisons")
    assert(hMeta === h0, "unsampled byte must not move the perceptual hash")
  }

  test("banded near-dup equals brute-force Hamming <= 6 on the committed fixture") {
    val out = Catalog.queries("m_image_neardup")(spark, "unused").collect()
      .map(r => (r.getAs[Long]("asset_a"), r.getAs[Long]("asset_b"), r.getAs[Long]("hamming")))
      .toSet
    // brute force over the same fixture through the same stub decode
    val hashes = Multimodal.perceptualHashes(
      spark.read.parquet(graft.sources.Fixtures.fixturesDir + "/media_variants.parquet")
        .as[Multimodal.MediaAsset](org.apache.spark.sql.Encoders.product))
      .collect()
      .map(h => h.assetId -> h.dhash)
    val brute = (for {
      i <- hashes.indices.iterator
      j <- (i + 1) until hashes.length
      d = java.lang.Long.bitCount(hashes(i)._2 ^ hashes(j)._2).toLong
      if d <= 6
    } yield {
      val (a, b) = (hashes(i)._1, hashes(j)._1)
      (math.min(a, b), math.max(a, b), d)
    }).toSet
    assert(out === brute, "8 bands of 8 bits guarantee recall at Hamming <= 7")
    // the planted pairs are all present: 10 visible edits (d <= 4 — two
    // touched pixels bound it; whether a given comparison flips depends
    // on the neighbors, so individual pairs may sit at 0) and 10
    // metadata edits (d == 0 by construction)
    val visPairs = (0 until 10).map { i =>
      val vis = out.find(p => p._1 == i.toLong && p._2 == 200L + i)
      assert(vis.nonEmpty, s"visible-edit pair $i missing")
      assert(vis.get._3 <= 4, s"visible-edit pair $i hamming ${vis.get._3}")
      vis.get._3
    }
    assert(visPairs.count(_ >= 1) >= 5, s"top-bit flips should move most hashes: $visPairs")
    for (i <- 0 until 10) {
      val meta = out.find(p => p._1 == 10L + i && p._2 == 300L + i)
      assert(meta.exists(_._3 === 0L), s"metadata-edit pair $i must be a perceptual exact dup")
    }
  }

  test("m_image_dedup resolves pairs into one keeper per perceptual cluster") {
    val pairs = Catalog.queries("m_image_neardup")(spark, "unused").collect()
      .map(r => (r.getAs[Long]("asset_a"), r.getAs[Long]("asset_b")))
    val out = Catalog.queries("m_image_dedup")(spark, "unused").collect()
      .map(r => (r.getAs[Long]("assetId"), r.getAs[Long]("rep"), r.getAs[Boolean]("is_kept")))
    assert(out.length === 120, "every image exactly once")
    // union-find ground truth over the pair set
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    assert(out.map(r => r._1 -> r._2).toMap === out.map(_._1).map(v => v -> find(v)).toMap)
    out.groupBy(_._2).foreach { case (rep, members) =>
      assert(members.count(_._3) === 1, s"cluster $rep keeper count")
      assert(members.filter(_._3).head._1 === rep, s"cluster $rep keeper is rep")
    }
    // the 20 planted variants collapse: exactly 100 keepers survive
    assert(out.count(_._3) === 100, s"keepers: ${out.count(_._3)}")
  }
}
