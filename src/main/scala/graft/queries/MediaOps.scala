package graft.queries

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.multimodal.Multimodal
import graft.multimodal.Multimodal.MediaAsset

/** Multimodal-column queries behind the driver's oracle gate.
  *
  * [[Multimodal]]'s transforms (decode, feature extraction, frame
  * sampling) run over a committed parquet fixture of synthetic assets
  * (binary payload + typed metadata — the schema a real media table
  * carries), and every output is reproduced in DuckDB from the same
  * parquet: the StubCodec chain is a pure function of the asset bytes
  * (FNV-1a 64 → splitmix64), so the oracle re-derives it with exact
  * mod-2^64 integer arithmetic over the blob — HUGEINT intermediates for
  * the wrapping multiplies, signed-BIGINT round-trips for the 64-bit
  * XORs. Swapping StubCodec for a real codec invalidates only the oracle
  * SQL, not the Spark plumbing these queries exercise (mapPartitions
  * batching, binary columns, metadata-driven fan-out).
  *
  * Outputs avoid floats except `meanLuma`, which is an integer-valued
  * division by 1000.0 — bit-identical IEEE on both engines.
  */
object MediaOps {

  /** Committed fixture location — generated once by [[ensureAssets]] and
    * checked into git so the DuckDB oracle reads the identical bytes.
    * Resolved through [[graft.sources.Fixtures.fixturesDir]] (working-dir
    * `fixtures/` by default, overridable via -Dgraft.fixtures.dir /
    * GRAFT_FIXTURES_DIR for JVMs launched outside the repo root); a
    * checkout elsewhere regenerates the same deterministic values on
    * first use and both engines read whatever file actually sits at this
    * path, so the compare stays self-consistent either way.
    */
  private val fixtureDir =
    Paths.get(graft.sources.Fixtures.fixturesDir, "media_assets.parquet")
      .toAbsolutePath.toString
  private val nAssets = 300
  private val featDim = 8

  /** The asset table: write the deterministic synthetic fixture on first
    * use (parquet dir committed), then always read back from parquet so
    * Spark and DuckDB see byte-identical content.
    */
  private def ensureAssets(s: SparkSession): Dataset[MediaAsset] = {
    if (!Files.exists(Paths.get(fixtureDir)))
      Multimodal.syntheticAssets(s, nAssets).coalesce(1)
        .write.mode("ignore").parquet(fixtureDir)
    implicit val enc = org.apache.spark.sql.Encoders.product[MediaAsset]
    s.read.parquet(fixtureDir).as[MediaAsset]
  }

  // ---- DuckDB mod-2^64 arithmetic helpers ------------------------------
  // HUGEINT (int128) carries the unsigned 64-bit domain [0, 2^64); the
  // wrapping multiply splits the left operand into 32-bit halves so no
  // intermediate exceeds ~2^97; XOR hops through signed BIGINT (the bit
  // pattern of u - 2^64 equals the unsigned pattern, so native 64-bit xor
  // is exact).

  private val TWO64 = "18446744073709551616::HUGEINT"

  private def mul64(a: String, b: String): String =
    s"((($a) % 4294967296::HUGEINT) * ($b) + " +
      s"((($a) // 4294967296::HUGEINT) * ($b) % 4294967296::HUGEINT) * 4294967296::HUGEINT) % $TWO64"

  private def u2s(x: String): String =
    s"CAST(CASE WHEN ($x) >= 9223372036854775808::HUGEINT THEN ($x) - $TWO64 ELSE ($x) END AS BIGINT)"

  private def s2u(x: String): String =
    s"(CASE WHEN ($x) < 0 THEN CAST(($x) AS HUGEINT) + $TWO64 ELSE CAST(($x) AS HUGEINT) END)"

  private def xor64(a: String, b: String): String = s2u(s"xor(${u2s(a)}, ${u2s(b)})")

  private def shr(a: String, n: Int): String = s"(($a) // ${1L << n}::HUGEINT)"

  /** FNV-1a 64 over the blob bytes (mirror of StubCodec.contentHash):
    * bytes decoded from `hex(content)` two digits at a time, folded with
    * the wrapping ×0x100000001b3. Only the low byte participates in each
    * XOR, so that one stays in plain integer math.
    */
  private val fnvOverContent: String = {
    val byteI =
      "(CAST(strpos('0123456789ABCDEF', substr(hex(content), 2*i-1, 1)) - 1 AS HUGEINT) * 16 + " +
        "CAST(strpos('0123456789ABCDEF', substr(hex(content), 2*i, 1)) - 1 AS HUGEINT))"
    val step = mul64(
      "acc - (acc % 256::HUGEINT) + " +
        "CAST(xor(CAST(acc % 256::HUGEINT AS BIGINT), CAST(b AS BIGINT)) AS HUGEINT)",
      "1099511628211::HUGEINT")
    s"""list_reduce(
       |  list_prepend(14695981039346656037::HUGEINT,
       |    list_transform(range(1, octet_length(content)+1), i -> $byteI)),
       |  (acc, b) -> $step)""".stripMargin
  }

  /** Shared CTE: every asset row plus `hu`, its unsigned FNV-1a hash. */
  private val oracleHashed: String =
    s"""hashed AS (
       |  SELECT assetId, kind, width, height, durationMs,
       |         $fnvOverContent AS hu
       |  FROM read_parquet('$fixtureDir/*.parquet'))""".stripMargin

  // ---- queries ---------------------------------------------------------

  /** Feature extraction through the real mapPartitions plumbing, checked
    * as an integer checksum: StubCodec.features expands the content hash
    * through a splitmix64 chain into floats in [-1, 1); `round((f+1)*1e6)`
    * recovers the pre-float integer exactly (float error ~0.06 ≪ 0.5), so
    * the checksum is the sum of the chain's raw residues — which the
    * oracle recomputes without ever touching floats.
    */
  val assetFeatures = Q(
    "m_asset_features",
    (s, _) => {
      Multimodal.extractFeatures(ensureAssets(s), dim = featDim)
        .toDF()
        .select(
          col("assetId"),
          col("kind"),
          expr(
            """aggregate(
              |  transform(features,
              |    f -> cast(round((cast(f as double) + 1.0d) * 1000000.0d) as bigint)),
              |  cast(0 as bigint), (a, x) -> a + x)""".stripMargin).as("feat_checksum"))
    },
    Some {
      val x = s"(hu + ${mul64("11400714819323198485::HUGEINT", "j")}) % $TWO64"
      s"""
      WITH $oracleHashed,
      xs AS (
        SELECT assetId, kind, $x AS x
        FROM hashed, (SELECT unnest(generate_series(1, $featDim)) AS j)),
      m1 AS (SELECT assetId, kind, ${mul64(xor64("x", shr("x", 30)), "13787848793156543929::HUGEINT")} AS z1 FROM xs),
      m2 AS (SELECT assetId, kind, ${mul64(xor64("z1", shr("z1", 27)), "10723151780598845931::HUGEINT")} AS z2 FROM m1),
      m3 AS (SELECT assetId, kind, ${xor64("z2", shr("z2", 31))} AS z3 FROM m2),
      ms AS (SELECT assetId, kind, ((${u2s("z3")} % 2000000 + 2000000) % 2000000) AS m FROM m3)
      SELECT assetId, kind, CAST(SUM(m) AS BIGINT) AS feat_checksum
      FROM ms GROUP BY assetId, kind
      """.stripMargin.trim
    },
  )

  /** Image decode pass (kind-filtered mapPartitions): dimensional metadata
    * plus the stub's hash-derived luma mean — `floorMod(h, 255000)/1000.0`,
    * an integer-valued double both engines divide identically.
    */
  val decodeImages = Q(
    "m_decode_images",
    (s, _) => Multimodal.decodeImages(ensureAssets(s)).toDF(),
    Some(s"""
      WITH $oracleHashed
      SELECT assetId, width, height,
             CAST((${u2s("hu")} % 255000 + 255000) % 255000 AS DOUBLE) / 1000.0 AS meanLuma
      FROM hashed WHERE kind = 'image'
    """.stripMargin.trim),
  )

  /** Frame sampling: executor-side row explosion (one row per sampled
    * frame, digest not bytes). frameHash = h XOR i*golden-ratio-64, both
    * wrapping — the oracle mirrors the wrap with mul64/xor64.
    */
  val frameStats = Q(
    "m_frame_stats",
    (s, _) => Multimodal.sampleFrames(ensureAssets(s), everyMs = 1000).toDF(),
    Some(s"""
      WITH $oracleHashed,
      frames AS (
        SELECT assetId, hu, unnest(generate_series(0, CAST(greatest(durationMs // 1000, 1) AS BIGINT) - 1)) AS i
        FROM hashed WHERE kind = 'video')
      SELECT assetId, CAST(i AS INTEGER) AS frameIdx, i * 1000 AS tsMs,
             ${u2s(xor64("hu", mul64("CAST(i AS HUGEINT)", "11400714819323198485::HUGEINT")))} AS frameHash
      FROM frames
    """.stripMargin.trim),
  )

  // ---------------------------------------------------------------------
  // Image perceptual-hash near-dup — extends dedup to the multimodal
  // columns: dHash (8×8 difference bits over the decoded 9×8 luma grid,
  // StubCodec.grayPixels being the clearly-marked locality-preserving
  // decode stand-in) + Hamming banding exactly like t_simhash_neardup:
  // 8 bands of 8 bits, so any pair within Hamming ≤ 7 shares at least
  // one band verbatim (k+1-bands guarantee) and candidates come from a
  // band equi-join, never all-pairs. Verification is exact
  // bit_count(xor) ≤ 6.
  //
  // Fixture: 100 pseudo-random base images + 10 "visible edit" variants
  // (two bytes at SAMPLED grid cells changed → dHash within 4 bits) +
  // 10 "metadata-only" variants (a byte the decoder never samples →
  // identical dHash; the EXIF-edit case perceptual hashing exists to
  // catch where byte-exact dedup fails). Committed parquet, so both
  // engines read identical bytes; the oracle re-derives pixels, dHash,
  // bands, and the banded join in DuckDB integer math.
  //
  // 100 TB shape: hash pass is one scan emitting 16 bytes/image; band
  // join is keyed by (band, 8-bit value) with the same mega-bucket cap
  // + remedy (more/wider bands) as the text-side LSH; the hash join
  // back to digests shuffles digests, never media bytes.
  // ---------------------------------------------------------------------

  private val variantsDir =
    Paths.get(graft.sources.Fixtures.fixturesDir, "media_variants.parquet")
      .toAbsolutePath.toString
  private val nBaseImages = 100
  private val payloadLen = 1024
  private val hammingMax = 6L
  private val nBands = 8
  private val maxBandBucket = 1 << 10

  private def mkImage(id: Long, bytes: Array[Byte]): MediaAsset =
    MediaAsset(id, "image", bytes, "png", 640, 480, 0, 0L)

  /** Well-mixed pseudo-random payload (splitmix-style) — fixture bases
    * must be mutually unrelated so the only near-dup pairs are the
    * planted ones (an affine byte pattern would make rotated grids
    * collide). One generator serves both the image and video fixtures,
    * disambiguated by seed.
    */
  private def mixedPayload(id: Long, len: Int, seed: Long): Array[Byte] =
    Array.tabulate[Byte](len) { i =>
      var z = (id + seed) * 0x9e3779b97f4a7c15L + i * 0xbf58476d1ce4e5b9L
      z = (z ^ (z >>> 30)) * 0x94d049bb133111ebL
      (z >>> 24).toByte
    }

  private def payload(id: Long): Array[Byte] = mixedPayload(id, payloadLen, 0L)

  /** Byte offsets sampled by the 9×8 grid: pixel i reads byte
    * i·len/72 — offsets 142 and 568 are pixels 10 and 40; offset 17 is
    * never sampled.
    */
  private def ensureVariants(s: SparkSession): Dataset[MediaAsset] = {
    implicit val enc = org.apache.spark.sql.Encoders.product[MediaAsset]
    if (!Files.exists(Paths.get(variantsDir))) {
      val base = (0 until nBaseImages).map(i => mkImage(i.toLong, payload(i.toLong)))
      val visibleEdits = (0 until 10).map { i =>
        val b = payload(i.toLong)
        // top-bit flips (±128): large luma moves at two sampled cells, so
        // most (not all — it depends on the neighbors) flip comparisons
        b(142) = (b(142) ^ 0x80).toByte
        b(568) = (b(568) ^ 0x80).toByte
        mkImage(200L + i, b)
      }
      val metaEdits = (0 until 10).map { i =>
        val b = payload(10L + i)
        b(17) = (b(17) + 3).toByte
        mkImage(300L + i, b)
      }
      s.createDataset(base ++ visibleEdits ++ metaEdits).coalesce(1)
        .write.mode("ignore").parquet(variantsDir)
    }
    s.read.parquet(variantsDir).as[MediaAsset]
  }

  /** 2^(8j) and 2^b literal lists — DuckDB-side shift tables (HUGEINT,
    * so bit 63 never overflows the signed domain).
    */
  private val oPow8: String =
    (0 until nBands).map(j => s"${BigInt(1) << (8 * j)}::HUGEINT").mkString("[", ", ", "]")
  private val oPowBit: String =
    (0 until 64).map(b => s"${BigInt(1) << b}::HUGEINT").mkString("[", ", ", "]")

  /** Unsigned byte at sampled offset `(i·len)//72` of the blob, via the
    * same hex-digit decode as [[fnvOverContent]] (1-based substr; byte k
    * sits at hex chars 2k+1, 2k+2 for 0-based k).
    */
  private def oPixAt(i: String): String = {
    val k = s"(($i) * octet_length(content)) // 72"
    s"""((strpos('0123456789ABCDEF', substr(hex(content), CAST(2*($k)+1 AS INTEGER), 1)) - 1) * 16
       | + (strpos('0123456789ABCDEF', substr(hex(content), CAST(2*($k)+2 AS INTEGER), 1)) - 1))""".stripMargin
  }

  /** One decode+dHash pass, lazily materialized: the digest frame feeds
    * the band generation AND both verification joins (and the dedup
    * composition's id list) — without the checkpoint the scan-side
    * subtree has no Exchange for ReuseExchange to match and the decode
    * pass (the dominant cost on a real media table) executes once per
    * consumer.
    */
  private def imageHashes(s: SparkSession): DataFrame =
    Multimodal.perceptualHashes(ensureVariants(s)).toDF().localCheckpoint(false)

  /** Banded dHash near-dup pairs — shared by the pair query and the
    * cluster-resolution composition.
    */
  private def imagePairs(s: SparkSession, hashes: DataFrame): DataFrame = {
    import s.implicits._
    val bandArr = array((0 until nBands).map(j =>
      shiftrightunsigned($"dhash", j * 8).bitwiseAND(lit(255L))): _*)
    val bands = hashes.select($"assetId", posexplode(bandArr).as(Seq("band", "bval")))
    // mega-bucket cap (≤ 2048 (band, value) keys — broadcast is safe at
    // any corpus size), same contract as the text-side LSH: an over-full
    // band bucket (boilerplate imagery) is skipped; remedy = wider bands
    val ok = bands.groupBy($"band", $"bval").agg(count(lit(1)).as("n_b"))
      .filter($"n_b" <= maxBandBucket)
      .select($"band", $"bval")
    val gated = bands.join(broadcast(ok), Seq("band", "bval"))
    val cand = gated.select($"assetId".as("asset_a"), $"band", $"bval")
      .join(
        gated.select($"assetId".as("asset_b"), $"band".as("band_b"), $"bval".as("bval_b")),
        $"band" === $"band_b" && $"bval" === $"bval_b" && $"asset_a" < $"asset_b")
      .select($"asset_a", $"asset_b")
      .distinct()
    cand
      .join(hashes.select($"assetId".as("asset_a"), $"dhash".as("dhash_a")), "asset_a")
      .join(hashes.select($"assetId".as("asset_b"), $"dhash".as("dhash_b")), "asset_b")
      .withColumn("hamming", expr("CAST(bit_count(dhash_a ^ dhash_b) AS BIGINT)"))
      .filter($"hamming" <= hammingMax)
      .select($"asset_a", $"asset_b", $"hamming")
  }

  /** Shared oracle CTE chain: pixels → dHash → bands → gated band join →
    * exact-Hamming pairs at the threshold (asset_a < asset_b).
    */
  private val oracleImagePairsCtes: String =
    s"""px AS (
       |        SELECT assetId, list_transform(range(0, 72), i -> ${oPixAt("i")}) AS p
       |        FROM read_parquet('$variantsDir/*.parquet') WHERE kind = 'image'),
       |      dh AS (
       |        SELECT assetId,
       |               list_reduce(list_prepend(0::HUGEINT, list_transform(range(0, 64),
       |                 b -> CASE WHEN p[CAST((b // 8) * 9 + (b % 8) AS INTEGER) + 2]
       |                              > p[CAST((b // 8) * 9 + (b % 8) AS INTEGER) + 1]
       |                           THEN $oPowBit[CAST(b AS INTEGER) + 1] ELSE 0::HUGEINT END)),
       |                 (acc, x) -> acc + x) AS hu
       |        FROM px),
       |      dhs AS (SELECT assetId, hu, ${u2s("hu")} AS dhash FROM dh),
       |      bands AS (
       |        SELECT assetId, j AS band, CAST((hu // $oPow8[CAST(j AS INTEGER) + 1]) % 256 AS BIGINT) AS bval
       |        FROM dhs, (SELECT unnest(generate_series(0, ${nBands - 1})) AS j)),
       |      ok AS (SELECT band, bval FROM bands GROUP BY 1, 2 HAVING COUNT(*) <= $maxBandBucket),
       |      gb AS (SELECT b.* FROM bands b JOIN ok USING (band, bval)),
       |      cand AS (
       |        SELECT DISTINCT a.assetId AS asset_a, c.assetId AS asset_b
       |        FROM gb a JOIN gb c ON a.band = c.band AND a.bval = c.bval AND a.assetId < c.assetId),
       |      ipairs AS (
       |        SELECT cand.asset_a, cand.asset_b,
       |               CAST(bit_count(xor(x.dhash, y.dhash)) AS BIGINT) AS hamming
       |        FROM cand
       |        JOIN dhs x ON x.assetId = cand.asset_a
       |        JOIN dhs y ON y.assetId = cand.asset_b
       |        WHERE bit_count(xor(x.dhash, y.dhash)) <= $hammingMax)""".stripMargin

  val imageNearDup = Q(
    "m_image_neardup",
    (s, _) => imagePairs(s, imageHashes(s)),
    Some(s"""
      WITH $oracleImagePairsCtes
      SELECT asset_a, asset_b, hamming FROM ipairs
    """.stripMargin.trim),
  )

  /** Perceptual-cluster resolution — the pairs→decision step for images,
    * exactly like `t_neardup_clusters` for text: connected components
    * over the dHash pair graph (pointer-doubling resolver), keeper = min
    * assetId per cluster; images in no pair keep themselves.
    */
  val imageDedup = Q(
    "m_image_dedup",
    (s, _) => {
      import s.implicits._
      val hashes = imageHashes(s) // ONE decode pass for pairs + id list
      val pairs = imagePairs(s, hashes)
        .select($"asset_a".as("doc_a"), $"asset_b".as("doc_b"))
      val cc = TextOps.connectedComponentsStats(pairs)
      hashes
        .select($"assetId")
        .join(cc.labels.select($"v".as("assetId"), $"lbl".as("rep0")), Seq("assetId"), "left")
        .select(
          $"assetId",
          coalesce($"rep0", $"assetId").as("rep"),
          ($"assetId" === coalesce($"rep0", $"assetId")).as("is_kept"),
          lit(cc.converged).as("converged"))
    },
    Some(s"""
      WITH RECURSIVE $oracleImagePairsCtes,
      und AS (
        SELECT asset_a AS v, asset_b AS nbr FROM ipairs
        UNION SELECT asset_b, asset_a FROM ipairs),
      reach(v, r) AS (
        SELECT v, v FROM (SELECT DISTINCT v FROM und)
        UNION
        SELECT u.v, reach.r FROM und u JOIN reach ON u.nbr = reach.v),
      comp AS (SELECT v, MIN(r) AS rep FROM reach GROUP BY v)
      SELECT d.assetId,
             COALESCE(c.rep, d.assetId) AS rep,
             d.assetId = COALESCE(c.rep, d.assetId) AS is_kept,
             TRUE AS converged
      FROM dhs d LEFT JOIN comp c ON c.v = d.assetId
    """.stripMargin.trim),
  )

  // ---------------------------------------------------------------------
  // Video near-dup by frame overlap — the containment cousin of the
  // image dHash pass: two videos are near-dups when the smaller one's
  // distinct frame-digest set is ≥ 60% contained in the other's
  // (re-encodes keep untouched frames' digests; a tail-trim keeps ALL
  // its remaining frames — containment, not Jaccard, is the right
  // measure for clips). Candidates come from a shared-digest equi-join
  // (the n-gram Jaccard shape on frame digests), with the usual
  // mega-bucket cap: a digest present in more than the cap's worth of
  // videos (boilerplate intro/outro frames) is skipped; the remedy is
  // longer frame windows.
  //
  // 100 TB shape: one digest pass (16 bytes/frame out, never media
  // bytes), one distinct, one digest-keyed equi-join + pair agg, one
  // size join with NO broadcast hint (both sides video-count-scale —
  // AQE decides). Never all-pairs.
  // ---------------------------------------------------------------------

  private val videoVariantsDir =
    Paths.get(graft.sources.Fixtures.fixturesDir, "media_video_variants.parquet")
      .toAbsolutePath.toString
  private val nBaseVideos = 60
  private val videoBytes = 1000 // 5 frames x 200 bytes/frame
  private val maxDigestAssets = 1 << 10

  /** Capped shared-digest containment join over (assetId, digest) rows —
    * the ONE implementation behind the video and audio near-dup passes:
    * distinct digests (lazily materialized once for sizes, the cap agg
    * and both join sides), mega-digest cap (boilerplate frames/windows
    * skipped), a<b self-join, per-pair shared counts, and the ≥ 60%
    * containment-of-the-smaller filter (containment, not Jaccard, so a
    * trimmed clip still matches its source).
    */
  private def containmentPairs(digestRows: DataFrame): DataFrame = {
    val s = digestRows.sparkSession
    import s.implicits._
    val dg = digestRows.toDF("assetId", "digest").distinct().localCheckpoint(false)
    val sizes = dg.groupBy($"assetId").agg(count(lit(1)).as("n_dig"))
    val ok = dg.groupBy($"digest").agg(count(lit(1)).as("n_a"))
      .filter($"n_a" <= maxDigestAssets)
      .select($"digest")
    val g = dg.join(broadcast(ok), "digest")
    val shared = g.select($"assetId".as("asset_a"), $"digest")
      .join(
        g.select($"assetId".as("asset_b"), $"digest".as("d_b")),
        $"digest" === $"d_b" && $"asset_a" < $"asset_b")
      .groupBy($"asset_a", $"asset_b")
      .agg(count(lit(1)).as("n_shared"))
    shared
      .join(sizes.select($"assetId".as("asset_a"), $"n_dig".as("n_a")), "asset_a")
      .join(sizes.select($"assetId".as("asset_b"), $"n_dig".as("n_b")), "asset_b")
      .filter($"n_shared" * 5 >= least($"n_a", $"n_b") * 3)
      .select(
        $"asset_a", $"asset_b", $"n_shared",
        floor(lit(100.0) * $"n_shared" / least($"n_a", $"n_b")).cast("long")
          .as("containment_pct"))
  }

  /** DuckDB mirror of [[containmentPairs]] over a CTE `dg(assetId,
    * digest)` — append after the digest CTEs.
    */
  private def oracleContainmentTail: String =
    s"""sizes AS (SELECT assetId, COUNT(*) AS n_dig FROM dg GROUP BY 1),
       |      ok AS (SELECT digest FROM dg GROUP BY 1 HAVING COUNT(*) <= $maxDigestAssets),
       |      g AS (SELECT dg.* FROM dg JOIN ok USING (digest)),
       |      shared AS (
       |        SELECT a.assetId AS asset_a, b.assetId AS asset_b, COUNT(*) AS n_shared
       |        FROM g a JOIN g b ON a.digest = b.digest AND a.assetId < b.assetId
       |        GROUP BY 1, 2)
       |      SELECT s.asset_a, s.asset_b, CAST(s.n_shared AS BIGINT) AS n_shared,
       |             CAST(FLOOR(100.0 * s.n_shared / least(x.n_dig, y.n_dig)) AS BIGINT)
       |               AS containment_pct
       |      FROM shared s
       |      JOIN sizes x ON x.assetId = s.asset_a
       |      JOIN sizes y ON y.assetId = s.asset_b
       |      WHERE s.n_shared * 5 >= least(x.n_dig, y.n_dig) * 3""".stripMargin

  private def mkVideo(id: Long, bytes: Array[Byte], durationMs: Long): MediaAsset =
    MediaAsset(id, "video", bytes, "mp4", 640, 480, 0, durationMs)

  private def videoPayload(id: Long): Array[Byte] = mixedPayload(id, videoBytes, 7000L)

  /** 60 pseudo-random base videos (5 s = 5 frames) + 10 "re-encode"
    * variants (one byte of frame 2's slice flipped → 4/5 frames shared,
    * 80% containment) + 10 "tail-trim" variants (same payload, 4 s → the
    * 4 remaining frames all shared, 100% containment of the smaller).
    */
  private def ensureVideoVariants(s: SparkSession): Dataset[MediaAsset] = {
    implicit val enc = org.apache.spark.sql.Encoders.product[MediaAsset]
    if (!Files.exists(Paths.get(videoVariantsDir))) {
      val base = (0 until nBaseVideos).map(i => mkVideo(i.toLong, videoPayload(i.toLong), 5000L))
      val reencodes = (0 until 10).map { i =>
        val b = videoPayload(i.toLong)
        b(450) = (b(450) ^ 0x80).toByte // inside frame 2's [400, 600) slice
        mkVideo(200L + i, b, 5000L)
      }
      val trims = (0 until 10).map { i =>
        mkVideo(300L + i, videoPayload(10L + i), 4000L)
      }
      s.createDataset(base ++ reencodes ++ trims).coalesce(1)
        .write.mode("ignore").parquet(videoVariantsDir)
    }
    s.read.parquet(videoVariantsDir).as[MediaAsset]
  }

  /** FNV-1a over the byte slice [lo0, hi0) of the blob (0-based, hi
    * exclusive) — [[fnvOverContent]] generalized to a sub-range; an
    * empty slice reduces to the FNV basis, matching the Scala side.
    * `lo0`/`hi0` are SQL expressions over the enclosing row.
    */
  private def fnvOverSlice(lo0: String, hi0: String): String = {
    val byteAt =
      "(CAST(strpos('0123456789ABCDEF', substr(hex(content), CAST(2*bi-1 AS INTEGER), 1)) - 1 AS HUGEINT) * 16 + " +
        "CAST(strpos('0123456789ABCDEF', substr(hex(content), CAST(2*bi AS INTEGER), 1)) - 1 AS HUGEINT))"
    val step = mul64(
      "acc - (acc % 256::HUGEINT) + " +
        "CAST(xor(CAST(acc % 256::HUGEINT AS BIGINT), CAST(b AS BIGINT)) AS HUGEINT)",
      "1099511628211::HUGEINT")
    s"""list_reduce(
       |  list_prepend(14695981039346656037::HUGEINT,
       |    list_transform(range(CAST(($lo0)+1 AS BIGINT), CAST(($hi0)+1 AS BIGINT)),
       |      bi -> $byteAt)),
       |  (acc, b) -> $step)""".stripMargin
  }

  val videoNearDup = Q(
    "m_video_neardup",
    (s, _) => {
      import s.implicits._
      containmentPairs(
        Multimodal.videoFrameDigests(ensureVideoVariants(s)).toDF()
          .select($"assetId", $"frameDigest"))
    },
    Some {
      // frame count clamped to the payload, mirroring videoFrameDigests
      val nFrames =
        "CAST(greatest(least(durationMs // 1000, (octet_length(content) + 199) // 200), 1) AS BIGINT)"
      s"""
      WITH v AS (
        SELECT assetId, content, durationMs
        FROM read_parquet('$videoVariantsDir/*.parquet') WHERE kind = 'video'),
      f0 AS (
        SELECT assetId, content, unnest(generate_series(0, $nFrames - 1)) AS i
        FROM v),
      dg AS (
        SELECT DISTINCT assetId,
               ${u2s(fnvOverSlice("i*200", "least((i+1)*200, octet_length(content))"))} AS digest
        FROM f0),
      $oracleContainmentTail
    """.stripMargin.trim
    },
  )

  // ---------------------------------------------------------------------
  // Audio near-dup by overlapping-window fingerprints — completes the
  // modality set (text/embedding/image/video/audio). Same containment
  // join as the video pass, but over OVERLAPPING window digests
  // (hop = window/2, the audio analog of text shingling — see
  // Multimodal.audioWindowDigests): a local edit costs ≤ 2 windows and
  // a hop-aligned trim keeps every remaining digest, so trims land at
  // 100% containment where a fixed frame grid would shatter them.
  // ---------------------------------------------------------------------

  private val audioVariantsDir =
    Paths.get(graft.sources.Fixtures.fixturesDir, "media_audio_variants.parquet")
      .toAbsolutePath.toString
  private val nBaseAudio = 60
  private val audioBytes = 2048 // 15 overlapping 256-byte windows at hop 128

  private def mkAudio(id: Long, bytes: Array[Byte]): MediaAsset =
    MediaAsset(id, "audio", bytes, "wav", 0, 0, 16000, 5000L)

  private def audioPayload(id: Long): Array[Byte] = mixedPayload(id, audioBytes, 9000L)

  /** 60 pseudo-random base clips + 10 one-byte edits (byte 640 lives in
    * windows 4 and 5 → 13/15 shared, 86%) + 10 hop-aligned head-trims
    * (drop the first 128 bytes → every one of the 14 remaining windows
    * shared, 100% — the shift-invariance case).
    */
  private def ensureAudioVariants(s: SparkSession): Dataset[MediaAsset] = {
    implicit val enc = org.apache.spark.sql.Encoders.product[MediaAsset]
    if (!Files.exists(Paths.get(audioVariantsDir))) {
      val base = (0 until nBaseAudio).map(i => mkAudio(i.toLong, audioPayload(i.toLong)))
      val edits = (0 until 10).map { i =>
        val b = audioPayload(i.toLong)
        b(640) = (b(640) ^ 0x80).toByte
        mkAudio(200L + i, b)
      }
      val trims = (0 until 10).map { i =>
        mkAudio(300L + i, audioPayload(10L + i).drop(128))
      }
      s.createDataset(base ++ edits ++ trims).coalesce(1)
        .write.mode("ignore").parquet(audioVariantsDir)
    }
    s.read.parquet(audioVariantsDir).as[MediaAsset]
  }

  val audioNearDup = Q(
    "m_audio_neardup",
    (s, _) => {
      import s.implicits._
      containmentPairs(
        Multimodal.audioWindowDigests(ensureAudioVariants(s)).toDF()
          .select($"assetId", $"winDigest"))
    },
    Some {
      // ceil-based window count, mirroring audioWindowDigests: a ragged
      // tail past the last full window gets one final partial window
      val nWins =
        """CAST(CASE WHEN octet_length(content) >= 256
          |          THEN (octet_length(content) - 256 + 127) // 128 + 1
          |          ELSE 1 END AS BIGINT)""".stripMargin
      s"""
      WITH a AS (
        SELECT assetId, content
        FROM read_parquet('$audioVariantsDir/*.parquet') WHERE kind = 'audio'),
      w0 AS (
        SELECT assetId, content, unnest(generate_series(0, $nWins - 1)) AS i
        FROM a),
      dg AS (
        SELECT DISTINCT assetId,
               ${u2s(fnvOverSlice("i*128", "least(i*128 + 256, octet_length(content))"))} AS digest
        FROM w0),
      $oracleContainmentTail
    """.stripMargin.trim
    },
  )

  val qs: Seq[Q] = Seq(assetFeatures, decodeImages, frameStats, imageNearDup,
    imageDedup, videoNearDup, audioNearDup)
}
