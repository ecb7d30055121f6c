package graft.queries

import graft.SparkSpec

/** Differential recount for the Lloyd step: a planted random frame driven
  * through the real operator plan (broadcast-centroid assignment →
  * posexplode → integer agg) must equal a from-scratch Scala recount that
  * replicates the engine's arithmetic exactly — dot products accumulated
  * left-to-right in double (dot_d's fold order), d2 quantized to micros
  * before the argmin, components quantized to micros BEFORE summing, and
  * the mean as one final floor. Any drift in quantization order (e.g.
  * summing floats then flooring) changes low-order digits and fails the
  * map equality.
  */
class KmeansStepSpec extends SparkSpec {

  private def dot(a: Array[Float], b: Array[Float]): Double = {
    var acc = 0.0
    var i = 0
    while (i < a.length) { acc += a(i).toDouble * b(i).toDouble; i += 1 }
    acc
  }

  test("one Lloyd step equals a brute-force fixed-point recount") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val dim = 8 // the operator is dimension-agnostic; small keeps the recount readable
    def vec(): Array[Float] = Array.fill(dim)(rnd.nextGaussian().toFloat)
    // ids 0-15 double as the centroids (the operator's convention)
    val cents = (0 until 16).map(i => (i.toLong, vec()))
    val members = (100 until 160).map(i => (i.toLong, vec()))
    val all = cents ++ members
    val emb = spark.createDataset(all.toIndexedSeq).toDF("vec_id", "embedding")
    graft.functions.GraftFunctions.registerDotD(spark)

    val centMap = cents.toMap
    val assign = all.map { case (id, v) =>
      val cell = cents.map { case (cid, c) =>
        (math.floor(1e6 * (dot(v, v) + dot(c, c) - 2.0 * dot(v, c))).toLong, cid)
      }.min._2 // tuple min = (d2_micros ASC, cell ASC) — the operator's tie-break
      (id, cell, v)
    }
    val expected = assign.groupBy(_._2).flatMap { case (cell, vs) =>
      (0 until dim).map { d0 =>
        val micros = vs.map(t => math.floor(1e6 * t._3(d0).toDouble).toLong)
        val n = vs.size.toLong
        val cOld = math.floor(1e6 * centMap(cell)(d0).toDouble).toLong
        val cNew = math.floor(1.0 * micros.sum / n).toLong
        (cell, (d0 + 1).toLong) -> ((n, cOld, cNew, math.abs(cNew - cOld)))
      }
    }

    val got = VectorOps.kmeansStepOn(emb).collect().map { r =>
      (r.getAs[Long]("cell"), r.getAs[Long]("d")) ->
        ((r.getAs[Long]("n_vecs"), r.getAs[Long]("c_old_micros"),
          r.getAs[Long]("c_new_micros"), r.getAs[Long]("shift_micros")))
    }.toMap

    assert(got.size === expected.size, "every (occupied cell, dim) exactly once")
    assert(got === expected)
    // every centroid is its own member -> no cell can be empty
    assert(got.keys.map(_._1).toSet === (0L until 16L).toSet)
  }
}
