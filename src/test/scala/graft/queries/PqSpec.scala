package graft.queries

import graft.SparkSpec

/** Property tests for the product-quantization pack: a planted corpus
  * whose vectors are exact concatenations of codeword sub-vectors must
  * encode to those codes with zero error, and the ADC search must equal
  * an independent brute-force reimplementation of the fixed-point ADC
  * contract (per-subspace floored micros, summed, top-k by (adc, id)).
  */
class PqSpec extends SparkSpec {

  private val dim = 64
  private val m = 4
  private val subDim = 16
  private val k = 16
  private val nQueries = 5
  private val topK = 10

  /** Left-to-right float->double dot product — the dot_d contract. */
  private def dot(a: Array[Float], b: Array[Float]): Double = {
    var acc = 0.0
    var i = 0
    while (i < a.length) { acc += a(i).toDouble * b(i).toDouble; i += 1 }
    acc
  }

  private def d2Micros(a: Array[Float], b: Array[Float]): Long =
    math.floor(1e6 * (dot(a, a) + dot(b, b) - 2.0 * dot(a, b))).toLong

  private def mkVecs(n: Int, seed: Int): IndexedSeq[Array[Float]] = {
    val rnd = new scala.util.Random(seed)
    IndexedSeq.fill(n)(Array.fill(dim)(rnd.nextFloat() * 2f - 1f))
  }

  private def toDf(vecs: Seq[(Long, Array[Float])]) = {
    import spark.implicits._
    graft.functions.GraftFunctions.registerDotD(spark)
    vecs.toDF("vec_id", "embedding")
  }

  test("vectors assembled from codeword slices encode to those codes with zero error") {
    val rnd = new scala.util.Random(11)
    val codewords = mkVecs(k, 7) // vec_id 0..15 = the codebook
    // 30 planted vectors: each subspace copies a chosen codeword's slice
    val chosen = IndexedSeq.fill(30)(Array.fill(m)(rnd.nextInt(k)))
    val planted = chosen.zipWithIndex.map { case (codes, i) =>
      val v = new Array[Float](dim)
      for (s <- 0 until m; j <- 0 until subDim)
        v(s * subDim + j) = codewords(codes(s))(s * subDim + j)
      (16L + i, v)
    }
    val df = toDf(codewords.zipWithIndex.map { case (v, i) => (i.toLong, v) } ++ planted)
    val out = VectorOps.pqCodesOn(df).collect()
      .map(r => (r.getAs[Long]("vec_id"), r.getAs[Long]("sub")) ->
        (r.getAs[Long]("code"), r.getAs[Long]("err_micros"))).toMap
    // every (vector, subspace) has a row
    assert(out.size == (k + 30) * m)
    chosen.zipWithIndex.foreach { case (codes, i) =>
      for (s <- 0 until m) {
        val (code, err) = out((16L + i, s.toLong))
        assert(code == codes(s).toLong, s"vec=${16 + i} sub=$s")
        assert(err == 0L, s"vec=${16 + i} sub=$s err=$err")
      }
    }
    // the codewords themselves snap to themselves
    for (c <- 0 until k; s <- 0 until m)
      assert(out((c.toLong, s.toLong)) == ((c.toLong, 0L)))
  }

  test("ADC search equals the brute-force fixed-point ADC contract") {
    val vecs = mkVecs(60, 23).zipWithIndex.map { case (v, i) => (i.toLong, v) }
    val byId = vecs.toMap
    val codewords = (0 until k).map(i => byId(i.toLong))
    def slice(v: Array[Float], s: Int): Array[Float] =
      v.slice(s * subDim, (s + 1) * subDim)
    // brute codes: argmin codeword per subspace, tie -> smaller code
    def codesOf(v: Array[Float]): IndexedSeq[Int] =
      (0 until m).map { s =>
        (0 until k).minBy(c => (d2Micros(slice(v, s), slice(codewords(c), s)), c))
      }
    val allCodes = vecs.map { case (id, v) => id -> codesOf(v) }.toMap
    // brute ADC top-k per query
    val expected = (k until k + nQueries).flatMap { q =>
      val qv = byId(q.toLong)
      val scored = vecs.filter(_._1 != q.toLong).map { case (id, _) =>
        val adc = (0 until m).map { s =>
          d2Micros(slice(qv, s), slice(codewords(allCodes(id)(s)), s))
        }.sum
        (id, adc)
      }
      scored.sortBy { case (id, adc) => (adc, id) }.take(topK).zipWithIndex
        .map { case ((id, adc), r) => (q.toLong, id, adc, r + 1L) }
    }.toSet
    val got = VectorOps.pqSearchOn(toDf(vecs)).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("cand_id"),
        r.getAs[Long]("adc_micros"), r.getAs[Long]("rnk"))).toSet
    assert(got == expected)
  }

  test("IVF-PQ search equals the brute-force composition of both contracts") {
    val nCells = 16
    val nProbe = 2
    val vecs = mkVecs(80, 31).zipWithIndex.map { case (v, i) => (i.toLong, v) }
    val byId = vecs.toMap
    val codewords = (0 until k).map(i => byId(i.toLong))
    def slice(v: Array[Float], s: Int): Array[Float] =
      v.slice(s * subDim, (s + 1) * subDim)
    def codesOf(v: Array[Float]): IndexedSeq[Int] =
      (0 until m).map { s =>
        (0 until k).minBy(c => (d2Micros(slice(v, s), slice(codewords(c), s)), c))
      }
    // IVF half: full-vector distance to the 16 centroid vectors
    def cellRanks(v: Array[Float]): IndexedSeq[Int] =
      (0 until nCells).sortBy(c => (d2Micros(v, byId(c.toLong)), c))
    val cellOf = vecs.map { case (id, v) => id -> cellRanks(v).head }.toMap
    val allCodes = vecs.map { case (id, v) => id -> codesOf(v) }.toMap
    val expected = (nCells until nCells + nQueries).flatMap { q =>
      val qv = byId(q.toLong)
      val probed = cellRanks(qv).take(nProbe).toSet
      val scored = vecs
        .filter { case (id, _) => id != q.toLong && probed.contains(cellOf(id)) }
        .map { case (id, _) =>
          val adc = (0 until m).map { s =>
            d2Micros(slice(qv, s), slice(codewords(allCodes(id)(s)), s))
          }.sum
          (id, adc)
        }
      scored.sortBy { case (id, adc) => (adc, id) }.take(topK).zipWithIndex
        .map { case ((id, adc), r) => (q.toLong, id, adc, r + 1L) }
    }.toSet
    val got = VectorOps.ivfPqSearchOn(toDf(vecs)).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("cand_id"),
        r.getAs[Long]("adc_micros"), r.getAs[Long]("rnk"))).toSet
    assert(got == expected)
  }

  test("residual IVF-PQ equals the brute-force residual composition; centroid residuals are zero") {
    val nCells = 16
    val nProbe = 2
    val cbLo = nCells + nQueries // 21
    val vecs = mkVecs(80, 47).zipWithIndex.map { case (v, i) => (i.toLong, v) }
    val byId = vecs.toMap
    def sub(v: Array[Float], s: Int): Array[Float] =
      v.slice(s * subDim, (s + 1) * subDim)
    def cellRanks(v: Array[Float]): IndexedSeq[Int] =
      (0 until nCells).sortBy(c => (d2Micros(v, byId(c.toLong)), c))
    val cellOf = vecs.map { case (id, v) => id -> cellRanks(v).head }.toMap
    // residual in FLOAT arithmetic (the zip_with contract)
    def residual(v: Array[Float], cell: Int): Array[Float] = {
      val c = byId(cell.toLong)
      Array.tabulate(v.length)(i => v(i) - c(i))
    }
    val residOf = vecs.map { case (id, v) => id -> residual(v, cellOf(id)) }.toMap
    // centroids' own residuals are identically zero (why they can't source the codebook)
    for (c <- 0 until nCells) assert(residOf(c.toLong).forall(_ == 0f))
    val codebook = (cbLo until cbLo + k).map(i => residOf(i.toLong))
    def codesOf(r: Array[Float]): IndexedSeq[Int] =
      (0 until m).map { s =>
        (0 until k).minBy(c => (d2Micros(sub(r, s), sub(codebook(c), s)), c))
      }
    val allCodes = vecs.map { case (id, _) => id -> codesOf(residOf(id)) }.toMap
    val expected = (nCells until nCells + nQueries).flatMap { q =>
      val qv = byId(q.toLong)
      val probed = cellRanks(qv).take(nProbe)
      val scored = probed.flatMap { cell =>
        val qr = residual(qv, cell)
        vecs
          .filter { case (id, _) => id != q.toLong && cellOf(id) == cell }
          .map { case (id, _) =>
            val adc = (0 until m).map { s =>
              d2Micros(sub(qr, s), sub(codebook(allCodes(id)(s) ), s))
            }.sum
            (id, adc)
          }
      }
      scored.sortBy { case (id, adc) => (adc, id) }.take(topK).zipWithIndex
        .map { case ((id, adc), r) => (q.toLong, id, adc, r + 1L) }
    }.toSet
    val got = VectorOps.ivfPqResidualSearchOn(toDf(vecs)).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("cand_id"),
        r.getAs[Long]("adc_micros"), r.getAs[Long]("rnk"))).toSet
    assert(got == expected)
  }

  test("search from the stored index equals the inline composition; probes prune partitions") {
    import org.apache.spark.sql.functions._
    graft.functions.GraftFunctions.registerDotD(spark)
    val emb = graft.sources.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val dir = java.nio.file.Files.createTempDirectory("ivfpq-index").toString
    VectorOps.writeIvfPqIndex(emb, dir)
    // the stored code table is laid out one directory per cell
    val cellDirs = new java.io.File(s"$dir/codes/epoch=0").listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("cell="))
    assert(cellDirs.length == 16)
    val queries = emb.filter(col("vec_id") >= 16 && col("vec_id") < 21)
      .select(col("vec_id").as("query_id"), col("embedding"))
    val indexed = VectorOps.ivfPqSearchFromIndex(spark, dir, queries)
    // partition pruning: the scan's partition filter carries the probed cells
    assert(indexed.queryExecution.executedPlan.toString.contains("PartitionFilters"))
    val got = indexed.collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("cand_id"),
        r.getAs[Long]("adc_micros"), r.getAs[Long]("rnk"))).toSet
    val inline = VectorOps.ivfPqSearchOn(emb).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("cand_id"),
        r.getAs[Long]("adc_micros"), r.getAs[Long]("rnk"))).toSet
    assert(got == inline)

    // keepIds pre-filter: the ADC top-k over the probed cells restricted
    // to the eligible ids — equals the unfiltered ranking with the
    // ineligible rows REMOVED BEFORE ranking (not post-dropped: ranks
    // re-pack densely over the eligible survivors)
    val keep = emb.filter(col("vec_id") % 2 === 0).select(col("vec_id"))
    val filt = VectorOps.ivfPqSearchFromIndex(spark, dir, queries,
        keepIds = Some(keep))
      .collect().map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("cand_id"),
        r.getAs[Long]("rnk")))
    assert(filt.nonEmpty && filt.forall(_._2 % 2 == 0),
      "every filtered candidate must be eligible")
    filt.groupBy(_._1).foreach { case (q, rs) =>
      assert(rs.map(_._3).sorted.toSeq === (1L to rs.length).toSeq,
        s"query $q: ranks must re-pack densely over the eligible survivors")
    }
  }

  test("deleteFromIvfPqIndex: forgotten vectors leave search; re-add resurrects; compaction physical") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    graft.functions.GraftFunctions.registerDotD(spark)
    val emb = graft.sources.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val dir = java.nio.file.Files.createTempDirectory("ivfpq-del").toString
    VectorOps.writeIvfPqIndex(emb, dir)
    val queries = emb.filter(col("vec_id") >= 16 && col("vec_id") < 21)
      .select(col("vec_id").as("query_id"), col("embedding"))
    def hits(d: String) = VectorOps.ivfPqSearchFromIndex(spark, d, queries)
      .collect().map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("cand_id"),
        r.getAs[Long]("rnk"))).toSet
    val before = hits(dir)
    // forget a returned candidate OUTSIDE the trained-parameter prefix
    // (ids < max(nCells, pqK) = 16 seed centroids/codebooks), so a
    // rebuild on corpus-minus-it shares the trained artifacts exactly
    val gone = before.map(_._2).filter(_ >= 16L).head
    VectorOps.deleteFromIvfPqIndex(Seq(gone).toDF("vec_id"), dir)
    val reb = java.nio.file.Files.createTempDirectory("ivfpq-del-reb").toString
    VectorOps.writeIvfPqIndex(emb.filter(col("vec_id") =!= gone), reb)
    assert(hits(dir) === hits(reb),
      "post-forget search must equal a rebuild without the vector")
    assert(!hits(dir).exists(_._2 == gone))
    // re-added (epoch above the tombstone): candidate comes back
    VectorOps.appendIvfPqIndex(emb.filter(col("vec_id") === gone), dir)
    assert(hits(dir) === before)
    // forget again, compact: physically gone, search stable, appendable
    VectorOps.deleteFromIvfPqIndex(Seq(gone).toDF("vec_id"), dir)
    VectorOps.compactIvfPqIndex(spark, dir)
    val st = graft.sources.IndexManifest.committedState(
      dir, graft.sources.IndexManifest.IvfPq)
    assert(st.baseEpoch === st.epoch)
    val raw = spark.read.option("basePath", s"$dir/codes")
      .parquet(s"$dir/codes").filter(col("epoch") === st.epoch)
    assert(raw.filter(col("vec_id") === gone).count() === 0L,
      "compaction must drop the forgotten codes physically")
    assert(hits(dir) === hits(reb))
  }

  test("appendIvfPqIndex equals rebuilding on the union corpus; search parity holds") {
    import org.apache.spark.sql.functions._
    graft.functions.GraftFunctions.registerDotD(spark)
    val emb = graft.sources.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val maxId = emb.agg(max(col("vec_id"))).head().getLong(0)
    // the arrivals: 30 existing vectors re-shipped under fresh high ids
    val arrivals = emb.filter(col("vec_id") % 7 === 0).limit(30)
      .select((col("vec_id") + maxId + 1).as("vec_id"), col("embedding"),
        col("label"))
    val appended = java.nio.file.Files.createTempDirectory("ivfpq-app").toString
    VectorOps.writeIvfPqIndex(emb, appended)
    VectorOps.appendIvfPqIndex(arrivals, appended)
    val rebuilt = java.nio.file.Files.createTempDirectory("ivfpq-reb").toString
    VectorOps.writeIvfPqIndex(emb.unionByName(arrivals), rebuilt)
    def codes(dir: String) = graft.sources.IndexManifest.readAppendOnly(spark, dir, "codes", graft.sources.IndexManifest.IvfPq)
      .collect().map(r => (r.getAs[Long]("vec_id"), r.getAs[Long]("sub"),
        r.getAs[Long]("code"), r.getAs[Long]("err_micros"),
        r.getAs[Number]("cell").longValue)).toSet
    assert(codes(appended) === codes(rebuilt),
      "append with stored artifacts must equal a union-corpus rebuild")
    // search parity over the grown index
    val queries = emb.filter(col("vec_id") >= 16 && col("vec_id") < 21)
      .select(col("vec_id").as("query_id"), col("embedding"))
    def hits(dir: String) = VectorOps.ivfPqSearchFromIndex(spark, dir, queries)
      .collect().map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("cand_id"),
        r.getAs[Long]("rnk"))).toSet
    assert(hits(appended) === hits(rebuilt))
  }

  test("recall audit over the fixture corpus: 10 returned per query, recall sane") {
    val out = VectorOps.pqRecall.spark(spark, "/root/testdata/sf0.001").collect()
    assert(out.length == nQueries)
    out.foreach { r =>
      assert(r.getAs[Long]("n_returned") == topK.toLong)
      val pct = r.getAs[Long]("recall_pct")
      assert(pct >= 0L && pct <= 100L)
    }
  }

  test("splitIvfPqCells: hot cells split exactly, codes conserved, window rebased, index stays live") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    graft.functions.GraftFunctions.registerDotD(spark)
    val emb = graft.sources.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val dir = java.nio.file.Files.createTempDirectory("ivfpq-split").toString
    VectorOps.writeIvfPqIndex(emb, dir)
    def codeSet(d: String) = graft.sources.IndexManifest
      .readAppendOnly(spark, d, "codes", graft.sources.IndexManifest.IvfPq)
      .collect().map(r => (r.getAs[Long]("vec_id"), r.getAs[Long]("sub"),
        r.getAs[Long]("code"))).toSet
    def cellOf(d: String) = graft.sources.IndexManifest
      .readAppendOnly(spark, d, "codes", graft.sources.IndexManifest.IvfPq)
      .filter(col("sub") === 0L)
      .collect().map(r => r.getAs[Long]("vec_id") ->
        r.getAs[Number]("cell").longValue).toMap
    val preCodes = codeSet(dir)
    val preCells = cellOf(dir)
    val preMax = preCells.groupBy(_._2).map(_._2.size).max

    val report = VectorOps.splitIvfPqCells(emb, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(report.nonEmpty, "fixture corpus must have over-cap cells")
    report.foreach { case (_, nb, _, _, nLo, nHi) => assert(nLo + nHi === nb) }

    // window rebased (compaction semantics): floor == head, old epochs
    // refused for time travel, and the new centroid generation is live
    val st = graft.sources.IndexManifest.committedState(
      dir, graft.sources.IndexManifest.IvfPq)
    assert(st.baseEpoch === st.epoch && st.epoch === 1L)
    val cents = spark.read.parquet(s"$dir/centroids/gen=1")
      .collect().map(r => r.getLong(0)).sorted
    assert(cents.length === 16 + report.count(_._6 > 0))

    // codes conserved bit-for-bit; only split-cell members moved, and
    // each moved exactly per the integer rule
    assert(codeSet(dir) === preCodes)
    val postCells = cellOf(dir)
    val vecsById = emb.collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    val hiIds = report.filter(_._6 > 0).map(_._1).sorted
      .zipWithIndex.map { case (c, i) => c -> (15L + 1L + i) }.toMap
    preCells.foreach { case (v, c) =>
      report.find(_._1 == c) match {
        case Some((_, _, dimIdx, mid2, _, _)) =>
          val vm = math.floor(vecsById(v)(dimIdx.toInt).toDouble * 1e6).toLong
          val expect = if (2 * vm <= mid2) c else hiIds(c)
          assert(postCells(v) === expect, s"vec $v of split cell $c")
        case None => assert(postCells(v) === c, s"vec $v of untouched cell $c")
      }
    }
    assert(postCells.groupBy(_._2).map(_._2.size).max < preMax,
      "rebalance must reduce the max cell size")

    // the rebalanced index serves appends + search with the NEW
    // generation: a planted twin of a moved member ranks beside it
    val moved = preCells.collect {
      case (v, c) if postCells(v) != c && v >= 21 => v
    }.head
    val maxId = emb.agg(max($"vec_id")).head().getLong(0)
    VectorOps.appendIvfPqIndex(
      emb.filter($"vec_id" === moved)
        .select(lit(maxId + 1).as("vec_id"), $"embedding", $"label"), dir)
    val probe = emb.filter($"vec_id" === moved)
      .select($"vec_id".as("query_id"), $"embedding")
    val top = VectorOps.ivfPqSearchFromIndex(spark, dir, probe)
      .collect().map(r => (r.getAs[Long]("cand_id"), r.getAs[Long]("rnk")))
    assert(top.exists { case (c, r) => c == maxId + 1 && r <= 2 },
      s"planted twin of moved member $moved must rank in the top 2: ${top.mkString(",")}")
    // travel below the rebalance floor refuses (old codes + new
    // centroids can never pair)
    intercept[IllegalArgumentException](
      VectorOps.ivfPqSearchFromIndex(spark, dir, probe, asOf = Some(0L)).collect())

    // the janitor: the superseded centroid generation (and the stale
    // epoch-0 code slice) are vacuumable garbage; the live generation
    // and the search survive
    assert(java.nio.file.Files.exists(java.nio.file.Paths.get(s"$dir/centroids/gen=0")))
    val removed = graft.sources.IndexManifest.vacuum(
      dir, graft.sources.IndexManifest.IvfPq)
    assert(removed >= 2L, s"expected stale epoch + gen dirs, removed $removed")
    assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(s"$dir/centroids/gen=0")))
    assert(java.nio.file.Files.exists(java.nio.file.Paths.get(s"$dir/centroids/gen=1")))
    assert(VectorOps.ivfPqSearchFromIndex(spark, dir, probe)
      .collect().map(r => (r.getAs[Long]("cand_id"), r.getAs[Long]("rnk"))).toSeq === top.toSeq)
  }

  test("ivfPqSearchFromIndex asOf: pinned epoch == pre-append twin, head sees the delta") {
    import org.apache.spark.sql.functions._
    graft.functions.GraftFunctions.registerDotD(spark)
    val emb = graft.sources.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val maxId = emb.agg(max(col("vec_id"))).head().getLong(0)
    // the delta: returned candidates re-shipped under fresh ids with a
    // guaranteed-closer twin of each query vector, so the head read MUST
    // rank differently from the pinned epoch
    val queries = emb.filter(col("vec_id") >= 16 && col("vec_id") < 21)
      .select(col("vec_id").as("query_id"), col("embedding"))
    val delta = queries
      .select((col("query_id") + maxId + 1).as("vec_id"), col("embedding"),
        lit(0).cast("int").as("label"))
    val dir = java.nio.file.Files.createTempDirectory("ivfpq-asof").toString
    VectorOps.writeIvfPqIndex(emb, dir)
    VectorOps.appendIvfPqIndex(delta, dir)
    def hits(d: String, asOf: Option[Long]) =
      VectorOps.ivfPqSearchFromIndex(spark, d, queries, asOf)
        .collect().map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("cand_id"),
          r.getAs[Long]("rnk"))).toSet
    val twin = java.nio.file.Files.createTempDirectory("ivfpq-asof-twin").toString
    VectorOps.writeIvfPqIndex(emb, twin)
    assert(hits(dir, Some(0L)) === hits(twin, None),
      "as-of 0 must rank exactly as the pre-append index")
    val head = hits(dir, None)
    assert(head !== hits(dir, Some(0L)), "the head read must see the delta")
    // each query's exact duplicate ranks first at head (ADC distance 0)
    queries.collect().map(_.getLong(0)).foreach { q =>
      assert(head.contains((q, q + maxId + 1, 1L)), s"query $q's planted twin not rank 1")
    }
    intercept[IllegalArgumentException](hits(dir, Some(2L)))
  }
}
