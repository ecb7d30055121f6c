package graft.queries

import graft.SparkSpec

/** Differential property test for the near-dup cluster resolver: random
  * edge sets — including long CHAINS, which force the label propagation
  * through many rounds (one per hop of component diameter) — driven
  * through the real iterative Spark operator and compared against an
  * independent union-find. Chains are the adversarial case: a fixpoint
  * bug that stops one round early produces components that LOOK plausible
  * (every label is some member's id) but split transitively-linked docs.
  */
class ConnectedComponentsSpec extends SparkSpec {

  private def unionFind(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    parent.keys.map(v => v -> find(v)).toMap
  }

  private def run(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    import spark.implicits._
    val df = spark.createDataset(edges.toIndexedSeq).toDF("doc_a", "doc_b")
    TextOps.connectedComponents(df).collect()
      .map(r => r.getAs[Long]("v") -> r.getAs[Long]("rep")).toMap
  }

  test("random graphs: operator components equal union-find") {
    for (seed <- 1 to 3) {
      val rnd = new scala.util.Random(40 + seed)
      val edges = Seq.fill(120)((rnd.nextInt(80).toLong, rnd.nextInt(80).toLong))
        .filter { case (a, b) => a != b }
        .map { case (a, b) => (math.min(a, b), math.max(a, b)) }
        .distinct
      assert(run(edges) === unionFind(edges), s"seed $seed")
    }
  }

  test("a long chain converges to one component (diameter stresses the fixpoint)") {
    // 0-1-2-...-30: min-label 0 must travel the full chain length
    val chain = (0L until 30L).map(i => (i, i + 1))
    val got = run(chain)
    assert(got.size === 31)
    assert(got.values.toSet === Set(0L), "every chain vertex must label down to 0")
    // two disjoint chains stay disjoint
    val two = chain ++ (100L until 110L).map(i => (i, i + 1))
    val got2 = run(two)
    assert(got2.filter(_._1 >= 100L).values.toSet === Set(100L))
    assert(got2.filter(_._1 < 100L).values.toSet === Set(0L))
  }

  test("pointer doubling: a 200-hop chain converges in O(log diameter) rounds") {
    import spark.implicits._
    val chain = (0L until 200L).map(i => (i, i + 1))
    val df = spark.createDataset(chain.toIndexedSeq).toDF("doc_a", "doc_b")
    val r = TextOps.connectedComponentsStats(df)
    assert(r.converged, "201-vertex chain must converge")
    assert(r.rounds <= 10, s"log-round bound: got ${r.rounds} rounds for diameter 200")
    val labels = r.labels.collect().map(x => x.getAs[Long]("v") -> x.getAs[Long]("lbl")).toMap
    assert(labels.size === 201)
    assert(labels.values.toSet === Set(0L))
  }

  test("exhausting maxRounds degrades to converged=false instead of throwing") {
    import spark.implicits._
    val chain = (0L until 40L).map(i => (i, i + 1))
    val df = spark.createDataset(chain.toIndexedSeq).toDF("doc_a", "doc_b")
    val r = TextOps.connectedComponentsStats(df, maxRounds = 1)
    assert(!r.converged, "one round cannot close a 40-hop chain")
    assert(r.rounds === 1)
    // the partial labels still come back (under-merged, never wrong-vertex)
    assert(r.labels.count() === 41)
    val flagged = TextOps.connectedComponents(df, maxRounds = 1)
      .select("converged").distinct().collect().map(_.getBoolean(0)).toSeq
    assert(flagged === Seq(false))
  }

  test("reliable checkpointDir option produces identical components") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val edges = Seq.fill(60)((rnd.nextInt(40).toLong, rnd.nextInt(40).toLong))
      .filter { case (a, b) => a != b }.distinct
    val df = spark.createDataset(edges.toIndexedSeq).toDF("doc_a", "doc_b")
    val dir = java.nio.file.Files.createTempDirectory("graft-cc-ckpt").toString
    try {
      val reliable = TextOps.connectedComponents(df, checkpointDir = Some(dir))
        .collect().map(x => x.getAs[Long]("v") -> x.getAs[Long]("rep")).toMap
      assert(reliable === unionFind(edges))
    } finally {
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
    }
  }

  test("t_neardup_clusters keeps exactly one doc per cluster, consistent with the pair set") {
    val sf = "/root/testdata/sf0.01"
    val pairs = Catalog.queries("t_minhash_lsh")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val clusters = Catalog.queries("t_neardup_clusters")(spark, sf).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("rep"), r.getAs[Boolean]("is_kept")))
    val want = unionFind(pairs)
    assert(clusters.map(c => c._1 -> c._2).toMap === want)
    // exactly one keeper per component, and it is the min member
    val byRep = clusters.groupBy(_._2)
    byRep.foreach { case (rep, members) =>
      assert(members.count(_._3) === 1, s"cluster $rep keeper count")
      assert(members.filter(_._3).head._1 === rep, s"cluster $rep keeper is not min")
      assert(members.map(_._1).min === rep, s"cluster $rep rep is not the min member")
    }
    assert(clusters.nonEmpty)
  }
}
