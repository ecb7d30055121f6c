package graft.multimodal

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.multimodal.Multimodal._

class MultimodalSpec extends SparkSpec {

  private lazy val assets = syntheticAssets(spark, 90, payloadBytes = 2048).cache()

  test("decodeImages: only image rows, deterministic luma, no payload in output") {
    val decoded = decodeImages(assets).collect()
    assert(decoded.length === 30) // 90 assets, kinds round-robin
    assert(decoded.forall(d => d.meanLuma >= 0 && d.meanLuma < 255))
    // deterministic: second run bit-identical
    val again = decodeImages(assets).collect()
    assert(decoded.sortBy(_.assetId).toSeq === again.sortBy(_.assetId).toSeq)
    // output schema carries no binary column
    assert(!decodeImages(assets).schema.fields.exists(_.dataType.typeName == "binary"))
  }

  test("extractFeatures: fixed dim, bounded values, joins back to VectorOps shape") {
    val feats = extractFeatures(assets, dim = 64)
    val rows = feats.collect()
    assert(rows.length === 90)
    assert(rows.forall(_.features.length === 64))
    assert(rows.forall(_.features.forall(f => f >= -1f && f < 1f)))
    // the feature table is ANN-ready: vec_id/embedding naming via select
    val annReady = feats.select(col("assetId").as("vec_id"), col("features").as("embedding"))
    assert(annReady.schema("embedding").dataType.typeName === "array")
  }

  test("resizeImages rewrites image metadata only") {
    val resized = resizeImages(assets, 224, 224).collect()
    resized.foreach { a =>
      if (a.kind == "image") { assert(a.width === 224); assert(a.height === 224) }
      else assert(a.width === (if (a.kind == "audio") 0 else 640))
    }
  }

  test("sampleFrames explodes videos at the requested cadence, bytes-free") {
    val frames = sampleFrames(assets, everyMs = 1000)
    val rows = frames.collect()
    // 30 videos x 5 frames (5000ms / 1000ms)
    assert(rows.length === 150)
    assert(rows.groupBy(_.assetId).forall(_._2.length == 5))
    assert(rows.filter(_.assetId == 2L).map(_.tsMs).sorted.toSeq === Seq(0L, 1000L, 2000L, 3000L, 4000L))
    assert(!frames.schema.fields.exists(_.dataType.typeName == "binary"))
  }

  test("repartitionByBytes sizes tasks by payload volume") {
    val total = 90L * 2048L
    val target = 16L * 2048L
    val repart = repartitionByBytes(assets, totalBytes = total, targetBytes = target)
    assert(repart.rdd.getNumPartitions === ((total + target - 1) / target).toInt)
    assert(repart.count() === 90)
    // byte balance: no partition exceeds targetBytes by more than one asset
    val partBytes = repart
      .mapPartitions(it => Iterator.single(it.map(_.content.length.toLong).sum))(
        org.apache.spark.sql.Encoders.scalaLong)
      .collect()
    assert(partBytes.forall(_ <= target + 2048L))
  }

  test("repartitionByBytes balances a size-skewed corpus") {
    import spark.implicits._
    // 4 big assets (64 KiB) among 60 small ones (1 KiB): row-hash
    // partitioning could land several big ones together; byte-binning can't
    val skewed = spark
      .range(64)
      .map { i =>
        val bytes = new Array[Byte](if (i % 16 == 0) 65536 else 1024)
        java.util.Arrays.fill(bytes, i.toByte)
        MediaAsset(i, "image", bytes, "png", 640, 480, 0, 0L)
      }
    val total = skewed.collect().map(_.content.length.toLong).sum
    val target = 80L * 1024L
    val repart = repartitionByBytes(skewed, totalBytes = total, targetBytes = target)
    val partBytes = repart
      .mapPartitions(it => Iterator.single(it.map(_.content.length.toLong).sum))(
        org.apache.spark.sql.Encoders.scalaLong)
      .collect()
      .filter(_ > 0)
    assert(repart.count() === 64)
    assert(partBytes.forall(_ <= target + 65536L))
  }

  test("repartitionByBytes spreads overflow evenly when totalBytes is understated") {
    // a 4x-understated stat used to clamp every overflow bin into the LAST
    // partition (recreating the straggler); the round-robin wrap spreads
    // them so each partition carries ~overflow-factor bins instead
    val total = 90L * 2048L
    val target = 16L * 2048L
    val repart = repartitionByBytes(assets, totalBytes = total / 4, targetBytes = target)
    val partBytes = repart
      .mapPartitions(it => Iterator.single(it.map(_.content.length.toLong).sum))(
        org.apache.spark.sql.Encoders.scalaLong)
      .collect()
    assert(repart.count() === 90)
    // even spread: no partition carries more than (overflow factor + 1) bins
    assert(partBytes.forall(_ <= 5L * target))
    assert(partBytes.count(_ > 0) > 1)
  }
}
