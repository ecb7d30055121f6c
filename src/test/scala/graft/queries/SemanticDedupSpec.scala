package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Semantic-dedup quality probes: (1) planted paraphrase twins — clusters
  * of near-identical embeddings — must collapse to one keeper per group
  * through the REAL operator plan (assignment → within-cell pairs →
  * components), while near-orthogonal noise survives untouched; (2) the
  * within-cell restriction's recall against the brute-force all-pairs
  * cosine set is measured — recorded in SCALING.md ("semantic dedup recall")
  * — and pinned at a floor;
  * precision must be exact, because within-cell candidates are scored
  * with the same exact cosine as brute force.
  */
class SemanticDedupSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"
  private val thresholdMicros = 250000L

  test("planted twin groups collapse to one keeper; noise vectors survive") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    def vec(): Array[Float] = Array.fill(64)(rnd.nextGaussian().toFloat)
    def jitter(v: Array[Float]): Array[Float] =
      v.map(x => x + (rnd.nextGaussian() * 0.001).toFloat)
    // ids 0-15 double as the centroids (the operator's convention);
    // 5 twin groups of 3 (a base vector + tiny jitter = cosine ~0.9998);
    // 20 independent noise vectors (pairwise cosine ~ N(0, 1/64))
    val cents = (0 until 16).map(i => (i.toLong, vec()))
    val twinBase = Seq.fill(5)(vec())
    val twins = twinBase.zipWithIndex.flatMap { case (v, g) =>
      (0 until 3).map(j => ((100 + g * 10 + j).toLong, jitter(v)))
    }
    val noise = (200 until 220).map(i => (i.toLong, vec()))
    val emb = spark.createDataset((cents ++ twins ++ noise).toIndexedSeq)
      .toDF("vec_id", "embedding")
    graft.functions.GraftFunctions.registerDotD(spark)
    val out = VectorOps.semanticDedupOn(emb).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("rep"), r.getAs[Boolean]("is_kept")))
    assert(out.length === cents.size + twins.size + noise.size)
    // ground truth: union-find over the operator's own pair set (twins may
    // legitimately absorb a nearby centroid/noise vector at a 0.25
    // threshold — what matters is component structure + keep-one)
    val pairs = VectorOps.semanticPairs(emb).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val expected = out.map(_._1).map(v => v -> find(v)).toMap
    assert(out.map(r => r._1 -> r._2).toMap === expected,
      "operator components must equal union-find over its own pair set")
    // a twin group is only guaranteed to collapse when all members share
    // a cell — a base vector sitting ON a Voronoi boundary can split its
    // jittered copies across cells (the SemDeDup approximation; the real
    // remedy is multiple clusterings). With jitter << assignment margin
    // this is rare; require at least 4 of 5 groups fully collapsed and
    // every group to collapse into at most 2 components.
    val groupComponents = (0 until 5).map { g =>
      val ids = (0 until 3).map(j => (100 + g * 10 + j).toLong)
      out.filter(r => ids.contains(r._1)).map(_._2).toSet.size
    }
    assert(groupComponents.count(_ == 1) >= 4, s"components per group: $groupComponents")
    assert(groupComponents.forall(_ <= 2), s"components per group: $groupComponents")
    // keep-one: exactly one keeper per component, and it is the rep itself
    out.groupBy(_._2).foreach { case (rep, members) =>
      assert(members.count(_._3) === 1, s"component $rep keeper count")
      assert(members.filter(_._3).head._1 === rep, s"component $rep keeper is rep")
    }
    // most noise vectors stay singletons — the 0.25 threshold sits at 2
    // sigma of the N(0, 1/64) pair-cosine distribution, so a few chance
    // absorptions are expected; the floor pins that the threshold does
    // real work without over-fitting one seed
    assert(out.count(r => r._1 >= 200 && r._2 == r._1 && r._3) >= 12)
  }

  test("within-cell pair recall vs brute force: exact precision, measured floor") {
    val emb = graft.sources.Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding"))
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray)
    // brute-force pair set at the operator's own integer threshold
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0
      var i = 0
      while (i < a.length) {
        dot += a(i).toDouble * b(i); na += a(i).toDouble * a(i); nb += b(i).toDouble * b(i)
        i += 1
      }
      dot / (math.sqrt(na) * math.sqrt(nb))
    }
    val brute = (for {
      i <- emb.indices.iterator
      j <- (i + 1) until emb.length
      if math.floor(1e6 * cos(emb(i)._2, emb(j)._2)) >= thresholdMicros
    } yield {
      val (a, b) = (emb(i)._1, emb(j)._1)
      (math.min(a, b), math.max(a, b))
    }).toSet
    val got = VectorOps.semanticPairs(graft.sources.Tables.embeddings(spark, sf))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got.subsetOf(brute), "within-cell pairs must be exact-cosine true pairs")
    assert(brute.nonEmpty, "threshold must select a non-empty pair set at sf0.001")
    val recall = got.size.toDouble / brute.size
    info(s"semantic pair recall@cell: $recall (${got.size}/${brute.size})")
    // near-orthogonal random vectors are the adversarial case for any
    // single-assignment partition (see VectorRecallSpec); the floor pins
    // the measured behavior so a regression in the assignment or the
    // pair join fails loudly rather than silently shrinking the edge set
    assert(recall >= 0.10, s"recall collapsed: $recall")
  }

  test("over-cap cell loses pairing eligibility AND is reported by the balance row") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    def vec(): Array[Float] = Array.fill(8)(rnd.nextGaussian().toFloat)
    def jitter(v: Array[Float]): Array[Float] =
      v.map(x => x + (rnd.nextGaussian() * 0.001).toFloat)
    val cents = (0 until 16).map(i => (i.toLong, vec()))
    // 1030 vectors hugging centroid 0 -> cell 0 holds 1 + 1030 > 1024
    val flood = (0 until 1030).map(i => ((1000 + i).toLong, jitter(cents(0)._2)))
    // a twin pair hugging centroid 5 -> stays under cap, must still pair
    val twins = Seq((5000L, jitter(cents(5)._2)), (5001L, jitter(cents(5)._2)))
    val emb = spark.createDataset((cents ++ flood ++ twins).toIndexedSeq)
      .toDF("vec_id", "embedding")
    graft.functions.GraftFunctions.registerDotD(spark)
    val cellSizes = VectorOps.ivfCells(emb)
      .groupBy(col("cell")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val overCap = cellSizes.filter(_._2 > 1024)
    assert(overCap.keySet === Set(0L), s"planted flood must over-fill exactly cell 0: $cellSizes")
    // the silent part, now asserted: no pair touches a flooded vector...
    val pairs = VectorOps.semanticPairs(emb)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(!pairs.exists { case (a, b) => (a >= 1000 && a < 3000) || (b >= 1000 && b < 3000) },
      "over-cap cell members must be excluded from pairing")
    // ...while an under-cap cell still pairs normally
    assert(pairs.contains((5000L, 5001L)), s"under-cap twin pair missing: ${pairs.toSeq}")
    // ...and the balance report surfaces exactly what was dropped
    val bal = VectorOps.indexBalanceOn(emb).collect().head
    assert(bal.getAs[Long]("n_overcap_cells") === 1L)
    assert(bal.getAs[Long]("n_dropped_vecs") === overCap(0L))
    assert(bal.getAs[Long]("max_cell") === overCap(0L))
  }

  test("index drift monitor: same-distribution delta is quiet, drifted delta alerts") {
    import spark.implicits._
    val rnd = new scala.util.Random(13)
    def vec(): Array[Float] = Array.fill(8)(rnd.nextGaussian().toFloat)
    def jitter(v: Array[Float]): Array[Float] =
      v.map(x => x + (rnd.nextGaussian() * 0.001).toFloat)
    val cents = (0 until 16).map(i => (i.toLong, vec()))
    // base: 320 vectors spread evenly (20 hugging each centroid)
    val base = (0 until 320).map(i => ((100 + i).toLong, jitter(cents(i % 16)._2)))
    // quiet delta: 80 vectors with the SAME even spread
    val quiet = (0 until 80).map(i => ((1000 + i).toLong, jitter(cents(i % 16)._2)))
    // drifted delta: 80 vectors ALL hugging centroid 3
    val drifted = (0 until 80).map(i => ((2000 + i).toLong, jitter(cents(3)._2)))
    def frame(delta: Seq[(Long, Array[Float])]) =
      spark.createDataset((cents ++ base).toIndexedSeq).toDF("vec_id", "embedding")
        .withColumn("batch", lit("base"))
        .unionByName(spark.createDataset(delta.toIndexedSeq)
          .toDF("vec_id", "embedding").withColumn("batch", lit("delta")))
    graft.functions.GraftFunctions.registerDotD(spark)
    def report(delta: Seq[(Long, Array[Float])]) = {
      val r = VectorOps.indexDriftOn(frame(delta)).collect().head
      (r.getAs[Long]("tv_ppm"), r.getAs[Long]("n_cells_drifted"))
    }
    val (tvQuiet, cellsQuiet) = report(quiet)
    val (tvDrift, cellsDrift) = report(drifted)
    info(s"quiet tv=$tvQuiet ppm cells=$cellsQuiet; drifted tv=$tvDrift ppm cells=$cellsDrift")
    assert(cellsQuiet === 0L, s"even delta must not alert (tv=$tvQuiet)")
    assert(tvDrift > 800000L, "an all-one-cell delta is ~15/16 total variation")
    assert(cellsDrift >= 2L, "the flooded cell and the starved ones must flag")
    assert(tvDrift > tvQuiet * 10)
  }

  test("t_semantic_dedup covers every embedding exactly once at sf0.01") {
    val out = Catalog.queries("t_semantic_dedup")(spark, "/root/testdata/sf0.01")
      .collect()
    val n = graft.sources.Tables.embeddings(spark, "/root/testdata/sf0.01").count()
    assert(out.length.toLong === n)
    assert(out.map(_.getAs[Long]("doc_id")).distinct.length.toLong === n)
    val keptReps = out.filter(_.getAs[Boolean]("is_kept")).map(_.getAs[Long]("rep")).toSet
    val allReps = out.map(_.getAs[Long]("rep")).toSet
    assert(keptReps === allReps, "every component must surface exactly its min-id keeper")
    assert(out.forall(_.getAs[Boolean]("converged")))
  }
}
