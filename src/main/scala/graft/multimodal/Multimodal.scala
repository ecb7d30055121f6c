package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, Encoders, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column support for a training-data pipeline: image/audio/
  * video travel as opaque `binary` columns with typed metadata, and the
  * per-asset compute (decode, feature extraction, resize, frame sampling)
  * runs as partition-batched executor-side transforms.
  *
  * ==STUBBED DECODE==
  * This container ships no image/audio codecs, so [[StubCodec]] is a
  * clearly-marked deterministic FAKE: it derives pixel/sample values from a
  * 64-bit FNV-1a hash of the asset bytes. Swap [[StubCodec]] for a real
  * codec (javacv, TwelveMonkeys, …) and nothing else changes — the Spark
  * side (schema, partitioning, batch shape, null handling) is real and
  * tested.
  *
  * ==Scale notes==
  * - Assets are value-heavy: `repartitionByBytes` targets a fixed number of
  *   bytes per task so one 4 GB video partition can't straggle a stage.
  * - All transforms are `mapPartitions` over iterators (the JVM analog of
  *   `mapInPandas` batches): codec init happens once per partition, not per
  *   row, and nothing materializes the whole partition in memory.
  * - Derived columns (features, frames) are emitted WITHOUT the source
  *   bytes so downstream shuffles move kilobytes, not the media payload;
  *   re-join on assetId when the bytes are needed again.
  */
object Multimodal {

  /** An opaque media asset: bytes + typed metadata (nullable per-kind). */
  final case class MediaAsset(
      assetId: Long,
      kind: String, // "image" | "audio" | "video"
      content: Array[Byte],
      format: String,
      width: Int, // images/video; 0 when n/a
      height: Int,
      sampleRate: Int, // audio; 0 when n/a
      durationMs: Long, // audio/video; 0 for stills
  )

  final case class DecodedImage(assetId: Long, width: Int, height: Int, meanLuma: Double)

  final case class ImageHash(assetId: Long, dhash: Long)

  final case class AssetFeatures(assetId: Long, kind: String, features: Array[Float])

  final case class VideoFrame(assetId: Long, frameIdx: Int, tsMs: Long, frameHash: Long)

  final case class FrameDigest(assetId: Long, frameIdx: Int, frameDigest: Long)

  final case class AudioWindow(assetId: Long, winIdx: Int, winDigest: Long)

  /** Deterministic stand-in for a media codec. Every value is a pure
    * function of the input bytes — tests rely on that determinism.
    */
  object StubCodec {
    /** FNV-1a 64-bit over the payload — the "decode" seed. */
    def contentHash(bytes: Array[Byte]): Long = {
      var h = 0xcbf29ce484222325L
      var i = 0
      while (i < bytes.length) { h = (h ^ (bytes(i) & 0xff)) * 0x100000001b3L; i += 1 }
      h
    }

    /** STUB: real impl would decode pixels; the fake returns a luma mean
      * derived from the hash (uniform in [0, 255)).
      */
    def decodeImage(a: MediaAsset): DecodedImage = {
      val h = contentHash(a.content)
      DecodedImage(a.assetId, a.width, a.height, math.floorMod(h, 255000L) / 1000.0)
    }

    /** STUB: real impl decodes and downsamples to a w×h grayscale grid;
      * the fake samples w·h evenly-spaced payload bytes. Unlike the
      * hash-derived stubs above, this one is deliberately
      * LOCALITY-PRESERVING — payloads differing in a few bytes yield
      * grids differing in at most those sampled cells — because that is
      * the property perceptual hashing exists to exploit (a re-encoded /
      * lightly-edited image decodes to nearly the same pixels).
      */
    def grayPixels(a: MediaAsset, w: Int = 9, h: Int = 8): Array[Int] = {
      val n = w * h
      val len = a.content.length
      Array.tabulate(n)(i => a.content((i.toLong * len / n).toInt) & 0xff)
    }

    /** dHash (difference hash): 8×8 bits over a 9×8 luma grid, bit r·8+c
      * set when the right neighbor is strictly brighter. Robust to global
      * brightness/contrast shifts (only ORDER between neighbors matters)
      * — the standard cheap perceptual fingerprint.
      */
    def dhash(a: MediaAsset): Long = {
      val px = grayPixels(a)
      var bits = 0L
      var r = 0
      while (r < 8) {
        var c = 0
        while (c < 8) {
          if (px(r * 9 + c + 1) > px(r * 9 + c)) bits |= 1L << (r * 8 + c)
          c += 1
        }
        r += 1
      }
      bits
    }

    /** STUB: real impl = embedding model inference; the fake expands the
      * hash into `dim` floats in [-1, 1) via a splitmix64 chain.
      */
    def features(a: MediaAsset, dim: Int): Array[Float] = {
      var x = contentHash(a.content)
      Array.fill(dim) {
        x += 0x9e3779b97f4a7c15L
        var z = x
        z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
        z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
        z = z ^ (z >>> 31)
        (math.floorMod(z, 2000000L) / 1000000.0 - 1.0).toFloat
      }
    }
  }

  /** Spread assets so each task carries ~`targetBytes` of payload — media
    * tables are bytes-bound, not row-bound, so row-count partitioning
    * straggles on heterogeneous asset sizes (one 4 GB video vs thousands of
    * thumbnails).
    *
    * Byte-weighted and EXACT: prefix-sums per-asset payload sizes, assigns
    * each asset to the byte-bin its cumulative offset falls in, and maps
    * bin i to partition i with an explicit `Partitioner` — every partition
    * carries at most `targetBytes` + one asset regardless of size OR
    * row-count skew (an asset larger than `targetBytes` gets a partition
    * to itself). A declarative `repartitionByRange` was rejected here:
    * `RangePartitioner` samples ROWS to place boundaries, so a corpus of
    * a million thumbnails plus ten single-row 4 GB-video bins puts all its
    * boundaries in the thumbnail bins and clumps the video bins into one
    * tail partition.
    *
    * The prefix sum itself is DISTRIBUTED: the slim `(assetId, bytes)`
    * projection is range-partitioned and sorted on assetId, each
    * partition's byte sum is collected (one Long per partition), the
    * driver turns those into exclusive per-partition start offsets, and a
    * second per-partition pass assigns bins from its own start offset —
    * no task ever sees more than its slice, so the binning holds at any
    * asset count (the earlier formulation ran one global-order window
    * task, documented fine only to ~10^8 assets). The sorted slim RDD is
    * persisted between the two passes so the range shuffle+sort runs
    * once (the sampled range boundaries are fixed inside the partitioner
    * at construction, so a recompute would be identical — the persist is
    * purely to avoid paying the sort twice).
    * The bin-map join is left to the planner, which
    * broadcasts it while it is small and shuffle-joins at the scale where
    * a per-asset broadcast would break. `totalBytes` (from table stats or
    * a prior scan) sizes the partition count without an extra action.
    * Note: the `.rdd` hand-off makes the repartition EAGER under AQE —
    * upstream stages run when this returns, with their results reused by
    * the returned Dataset's lineage.
    */
  def repartitionByBytes(
      assets: Dataset[MediaAsset],
      totalBytes: Long,
      targetBytes: Long = 128L << 20,
  ): Dataset[MediaAsset] = {
    val spark = assets.sparkSession
    implicit val enc = Encoders.product[MediaAsset]
    val numBins = math.max(1L, (totalBytes + targetBytes - 1) / targetBytes).toInt
    // distributed exclusive prefix sum over assetId order: range-partition
    // + sort, per-partition byte totals to the driver (one Long each),
    // then per-partition bin assignment from the exclusive start offsets
    val slim = assets
      .select(col("assetId"), length(col("content")).cast("long").as("bytes"))
    val sorted = slim
      .as[(Long, Long)](Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong))
      .rdd
      .sortByKey()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val partSums = sorted
      .mapPartitionsWithIndex((pid, it) => Iterator.single((pid, it.map(_._2).sum)))
      .collect()
      .sortBy(_._1)
      .map(_._2)
    val startOffsets = partSums.scanLeft(0L)(_ + _) // exclusive prefix per partition
    val binsRdd = sorted.mapPartitionsWithIndex { (pid, it) =>
      var cum = startOffsets(pid)
      it.map { case (id, bytes) =>
        val bin = cum / targetBytes
        cum += bytes
        (id, bin)
      }
    }
    import spark.implicits._
    val bins = binsRdd.toDF("binAssetId", "byteBin")
    // asset-side columns derived from the encoder schema, not hand-listed
    val assetCols = enc.schema.fieldNames.map(col)
    val keyed = assets
      .join(bins, col("assetId") === col("binAssetId"))
      .select(col("byteBin"), struct(assetCols: _*).as("asset"))
      .as[(Long, MediaAsset)](Encoders.tuple(Encoders.scalaLong, enc))
    val byBin = new org.apache.spark.Partitioner {
      override def numPartitions: Int = numBins
      // Overflow bins — possible when the caller's `totalBytes` stat
      // understates the real payload — wrap round-robin rather than clamp
      // into the last partition: a 2x-understated stat then costs every
      // partition ~2 bins evenly instead of recreating the one straggler
      // partition this function exists to eliminate. With an accurate
      // stat every bin is < numBins and the mapping is the identity.
      override def getPartition(key: Any): Int =
        math.floorMod(key.asInstanceOf[Long], numBins.toLong).toInt
    }
    // EAGER under AQE: .rdd runs the upstream exchanges (including both
    // passes over `sorted`) right here, so the cached sort blocks are
    // consumed by the time it returns — unpersist rather than leak them
    // for the session's lifetime. A post-unpersist recompute (executor
    // loss) is deterministic: the range boundaries are fixed inside the
    // partitioner at construction.
    val keyedRdd = keyed.rdd
    sorted.unpersist(blocking = false)
    spark.createDataset(keyedRdd.partitionBy(byBin).map(_._2))
  }

  /** Decode pass: one codec per partition, iterator in / iterator out
    * (mapInPandas batch shape), media bytes NOT in the output.
    */
  def decodeImages(assets: Dataset[MediaAsset]): Dataset[DecodedImage] = {
    implicit val enc = Encoders.product[DecodedImage]
    assets
      .filter(col("kind") === "image")
      .mapPartitions { it =>
        // real codec: init native decoder here, once per partition
        it.map(StubCodec.decodeImage)
      }
  }

  /** Perceptual-hash pass: one 64-bit dHash per image, computed
    * executor-side from the decoded grid ([[StubCodec.dhash]]); output
    * carries the digest, never the media bytes, so the downstream
    * near-dup join shuffles 16 bytes per image.
    */
  def perceptualHashes(assets: Dataset[MediaAsset]): Dataset[ImageHash] = {
    implicit val enc = Encoders.product[ImageHash]
    assets
      .filter(col("kind") === "image")
      .mapPartitions { it =>
        // real codec: init native decoder here, once per partition
        it.map(a => ImageHash(a.assetId, StubCodec.dhash(a)))
      }
  }

  /** Feature extraction (any kind) → compact vectors for the ANN/dedup
    * operators in [[graft.queries.VectorOps]].
    */
  def extractFeatures(assets: Dataset[MediaAsset], dim: Int = 64): Dataset[AssetFeatures] = {
    implicit val enc = Encoders.product[AssetFeatures]
    assets.mapPartitions { it =>
      it.map(a => AssetFeatures(a.assetId, a.kind, StubCodec.features(a, dim)))
    }
  }

  /** Resize: metadata-true transform; the STUB keeps payload bytes but
    * rewrites the dimensional metadata (a real impl would re-encode).
    */
  def resizeImages(assets: Dataset[MediaAsset], w: Int, h: Int): Dataset[MediaAsset] = {
    implicit val enc = Encoders.product[MediaAsset]
    assets.mapPartitions { it =>
      it.map(a => if (a.kind == "image") a.copy(width = w, height = h) else a)
    }
  }

  /** Frame sampling: one row per sampled frame, `everyMs` apart across the
    * asset's duration — the row explosion happens executor-side and carries
    * a frame digest, not frame bytes.
    */
  def sampleFrames(assets: Dataset[MediaAsset], everyMs: Long = 1000): Dataset[VideoFrame] = {
    implicit val enc = Encoders.product[VideoFrame]
    assets
      .filter(col("kind") === "video")
      .mapPartitions { it =>
        it.flatMap { a =>
          val n = math.max(1L, a.durationMs / everyMs).toInt
          val h = StubCodec.contentHash(a.content)
          (0 until n).iterator.map { i =>
            // real impl: seek + decode frame i*everyMs
            VideoFrame(a.assetId, i, i * everyMs, h ^ (i.toLong * 0x9e3779b97f4a7c15L))
          }
        }
      }
  }

  /** Per-frame content digests for video near-dup: frame i's digest is
    * the FNV-1a hash of the payload slice [i·bytesPerFrame,
    * (i+1)·bytesPerFrame) — like [[StubCodec.grayPixels]], deliberately
    * LOCALITY-PRESERVING (a real impl hashes each decoded frame; frames
    * untouched by an edit keep their digest, and a tail-trimmed copy
    * keeps every remaining frame's digest — the two properties
    * frame-overlap dedup exploits). One row per frame, digest only,
    * never the media bytes. The frame count is clamped to the payload
    * (`ceil(len / bytesPerFrame)`): without the clamp, every
    * past-end-of-payload frame of every duration-overstated video would
    * hash the empty slice to the identical FNV basis, and unrelated
    * videos would "share" those phantom frames straight through the
    * containment threshold.
    */
  def videoFrameDigests(
      assets: Dataset[MediaAsset],
      frameMs: Long = 1000,
      bytesPerFrame: Int = 200,
  ): Dataset[FrameDigest] = {
    implicit val enc = Encoders.product[FrameDigest]
    assets
      .filter(col("kind") === "video")
      .mapPartitions { it =>
        it.flatMap { a =>
          val payloadFrames = (a.content.length.toLong + bytesPerFrame - 1) / bytesPerFrame
          val n = math.max(1L, math.min(a.durationMs / frameMs, payloadFrames)).toInt
          (0 until n).iterator.map { i =>
            val d = StubCodec.contentHash(
              a.content.slice(i * bytesPerFrame, (i + 1) * bytesPerFrame))
            FrameDigest(a.assetId, i, d)
          }
        }
      }
  }

  /** Overlapping-window digests for audio near-dup — the fingerprint
    * shape differs from video's fixed frames on purpose: audio edits
    * rarely align to any frame grid, so fingerprints hash OVERLAPPING
    * windows (hop = half the window), the audio analog of text
    * shingling. Two properties fall out: a local edit invalidates at
    * most window/hop (= 2) windows, and a clip trimmed at any
    * hop-aligned offset keeps ALL its remaining window digests —
    * shift-invariance at hop granularity, which fixed frames cannot
    * give. A payload shorter than one window hashes whole as its single
    * window; a ragged tail past the last full window gets one final
    * PARTIAL window (ceil-based count), so every payload byte is
    * covered — a tail-only edit must invalidate a digest, the same
    * every-byte-covered rule as videoFrameDigests' clamp. Digest rows
    * only, never the samples.
    */
  def audioWindowDigests(
      assets: Dataset[MediaAsset],
      windowBytes: Int = 256,
      hopBytes: Int = 128,
  ): Dataset[AudioWindow] = {
    implicit val enc = Encoders.product[AudioWindow]
    assets
      .filter(col("kind") === "audio")
      .mapPartitions { it =>
        it.flatMap { a =>
          val len = a.content.length
          val n =
            if (len >= windowBytes) (len - windowBytes + hopBytes - 1) / hopBytes + 1
            else 1
          (0 until n).iterator.map { i =>
            val lo = i * hopBytes
            val hi = math.min(lo + windowBytes, len)
            AudioWindow(a.assetId, i, StubCodec.contentHash(a.content.slice(lo, hi)))
          }
        }
      }
  }

  /** Deterministic synthetic asset table (tests + demos): payload bytes
    * derived from the id, kinds round-robin.
    */
  def syntheticAssets(spark: SparkSession, n: Int, payloadBytes: Int = 1024): Dataset[MediaAsset] = {
    implicit val enc = Encoders.product[MediaAsset]
    import spark.implicits._
    spark
      .range(n)
      .as[Long]
      .map { id =>
        val kind = Seq("image", "audio", "video")(math.floorMod(id, 3L).toInt)
        val bytes = Array.tabulate[Byte](payloadBytes)(i => ((id * 31 + i) % 251).toByte)
        MediaAsset(
          assetId = id,
          kind = kind,
          content = bytes,
          format = if (kind == "image") "png" else if (kind == "audio") "wav" else "mp4",
          width = if (kind == "audio") 0 else 640,
          height = if (kind == "audio") 0 else 480,
          sampleRate = if (kind == "audio") 16000 else 0,
          durationMs = if (kind == "image") 0L else 5000L,
        )
      }
  }
}
