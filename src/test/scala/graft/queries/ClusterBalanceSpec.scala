package graft.queries

import graft.SparkSpec

/** Planted-skew oracle for v_cluster_balance: a dominated cell must be
  * sampled down toward the cap while tail cells survive whole, the keep
  * decision must be the deterministic vec_id hash gate (bit-stable across
  * runs and corpus growth), and rates must follow the closed form
  * min(1, cap/|cell|).
  */
class ClusterBalanceSpec extends SparkSpec {

  private def h60(s: String): Long = {
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex.substring(0, 15), 16)
  }

  test("dominated cell capped at ~cap expected keeps; tail cells kept whole") {
    import spark.implicits._
    val rnd = new scala.util.Random(31)
    def vec(): Array[Float] = Array.fill(16)(rnd.nextGaussian().toFloat)
    // 16 well-separated centroids (the operator's convention: ids 0-15)
    val cents = (0 until 16).map(i => (i.toLong, Array.tabulate(16)(d => if (d == i) 10f else 0f)))
    def near(c: Int): Array[Float] =
      Array.tabulate(16)(d => (if (d == c) 10f else 0f) + (rnd.nextGaussian() * 0.01).toFloat)
    // cell 0 dominated: 200 members; cell 1 tail: 5 members
    val dense = (100 until 300).map(i => (i.toLong, near(0)))
    val tail = (400 until 405).map(i => (i.toLong, near(1)))
    val emb = spark.createDataset((cents ++ dense ++ tail).toIndexedSeq)
      .toDF("vec_id", "embedding")
    graft.functions.GraftFunctions.registerDotD(spark)
    val out = VectorOps.clusterBalanceOn(emb).collect()
      .map(r => (r.getAs[Long]("vec_id"), r.getAs[Long]("cell"), r.getAs[Long]("n_c"),
        r.getAs[Long]("rate_ppm"), r.getAs[Boolean]("is_kept")))
    val byCell = out.groupBy(_._2)
    // cell 0 = its centroid + 200 planted members
    val c0 = byCell(0L)
    assert(c0.length === 201)
    assert(c0.forall(_._4 === 1000000L * 24 / 201))
    // the hash gate is the spec'd closed form, row by row
    out.foreach { case (id, _, _, rate, kept) =>
      assert(kept === (h60(s"$id:cb") % 1000000 < rate), s"vec $id")
    }
    // expected keeps ~ cap: binomial(201, 24/201) — [8, 40] is ±5 sigma
    val kept0 = c0.count(_._5)
    assert(kept0 >= 8 && kept0 <= 40, s"cell 0 kept $kept0")
    // tail cell under the cap: rate 1e6, every member kept
    val c1 = byCell(1L)
    assert(c1.length === 6 && c1.forall(r => r._4 === 1000000L && r._5))
  }

  test("verdicts are stable when the corpus grows (hash gate, not rand/position)") {
    import spark.implicits._
    val rnd = new scala.util.Random(37)
    def near(c: Int, eps: Double): Array[Float] =
      Array.tabulate(8)(d => (if (d == c % 8) 5f else 0f) + (rnd.nextGaussian() * eps).toFloat)
    val cents = (0 until 16).map(i => (i.toLong, near(i, 0.0)))
    val base = (100 until 160).map(i => (i.toLong, near(i % 4, 0.01)))
    val extra = (200 until 230).map(i => (i.toLong, near(i % 4, 0.01)))
    graft.functions.GraftFunctions.registerDotD(spark)
    def run(rows: Seq[(Long, Array[Float])]): Map[Long, Boolean] =
      VectorOps.clusterBalanceOn(
        spark.createDataset(rows.toIndexedSeq).toDF("vec_id", "embedding"))
        .collect()
        .map(r => r.getAs[Long]("vec_id") -> r.getAs[Boolean]("is_kept")).toMap
    val before = run(cents ++ base)
    val after = run(cents ++ base ++ extra)
    // growth can only LOWER a cell's rate; a vector kept after growth was
    // kept before, and any flip is kept->dropped, never the reverse
    (cents ++ base).map(_._1).foreach { id =>
      if (after(id)) assert(before(id), s"vec $id flipped dropped->kept on growth")
    }
  }
}
