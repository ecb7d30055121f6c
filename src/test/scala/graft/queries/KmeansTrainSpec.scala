package graft.queries

import graft.SparkSpec

/** The Lloyd trainer loop against the single-step catalog row: step 1
  * must publish exactly v_kmeans_step's means, re-runs must be
  * bit-identical (order-independent fixed-point arithmetic), and the
  * per-step shift telemetry must register movement then settle on a
  * clusterable planted corpus.
  */
class KmeansTrainSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("step 1 equals v_kmeans_step's published means; re-runs are bit-identical") {
    val emb = graft.sources.Tables.embeddings(spark, sf)
    val (cents1, shifts1) = VectorOps.kmeansTrain(emb, steps = 1)
    val step = Catalog.queries("v_kmeans_step")(spark, sf).collect()
      .map(r => (r.getAs[Long]("cell"), r.getAs[Long]("d"), r.getAs[Long]("c_new_micros")))
    step.foreach { case (cell, d, m) =>
      val got = math.floor(1e6 * cents1.find(_._1 == cell).get._2(d.toInt - 1)).toLong
      // centroid components round-trip through float: exact for |m| < 2^24-ish
      assert(math.abs(got - m) <= 1L, s"cell $cell dim $d: trained $got vs step $m")
    }
    assert(shifts1.length === 1 && shifts1.head > 0L)
    val (cents2, shifts2) = VectorOps.kmeansTrain(emb, steps = 1)
    assert(cents2.map(_._2.toSeq) === cents1.map(_._2.toSeq) && shifts2 === shifts1)
  }

  test("distributed update is bit-identical to the driver loop (both routes)") {
    val emb = graft.sources.Tables.embeddings(spark, sf)
    val (cd, sd) = VectorOps.kmeansTrain(emb, steps = 2) // driver path (16x64 <= budget)
    val (cj, sj) = VectorOps.kmeansTrainDistributed(emb, steps = 2)
    assert(cj.map(_._1) === cd.map(_._1))
    assert(cj.map(_._2.toSeq) === cd.map(_._2.toSeq), "centroids diverge")
    assert(sj === sd, "shift telemetry diverges")
    // and the guard actually routes: with a zero budget kmeansTrain must
    // take the distributed path and still return the identical artifact
    spark.conf.set("spark.graft.kmeans.driverCellsDimMax", "0")
    try {
      val (cg, sg) = VectorOps.kmeansTrain(emb, steps = 2)
      assert(cg.map(_._2.toSeq) === cd.map(_._2.toSeq) && sg === sd)
    } finally spark.conf.unset("spark.graft.kmeans.driverCellsDimMax")
  }

  test("on a planted mixture the trainer moves then settles") {
    import spark.implicits._
    val rnd = new scala.util.Random(3)
    // 16 seed vectors (the initial centroids) + 3 tight gaussian blobs of
    // 50 vectors each, far from the origin in 3 distinct directions
    def noise() = Array.fill(64)((rnd.nextGaussian() * 0.01).toFloat)
    def blob(dir: Int, n: Int, base: Long) = (0 until n).map { i =>
      val v = noise(); v(dir) = v(dir) + 10f
      (base + i, v)
    }
    val emb = ((0L until 16L).map(i => (i, noise())) ++
      blob(20, 50, 100) ++ blob(40, 50, 200) ++ blob(60, 50, 300))
      .toDF("vec_id", "embedding")
    val (_, shifts) = VectorOps.kmeansTrain(emb, steps = 4)
    assert(shifts.length === 4)
    assert(shifts.head > shifts.last, s"no settling: $shifts")
    // once blob members captured their centroids, later steps barely move:
    // max component shift in the last step under 1% of the blob offset
    assert(shifts.last < 100000L, s"still moving after 4 steps: $shifts")
  }
}
