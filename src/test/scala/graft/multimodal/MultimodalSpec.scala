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
    val repart = repartitionByBytes(assets, totalBytes = total, targetBytes = 16L * 2048L)
    assert(repart.rdd.getNumPartitions === (total / (16 * 2048)).toInt)
    assert(repart.count() === 90)
  }
}
