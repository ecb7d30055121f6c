package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Timing probe for the iterative PageRank: edge-build cost vs
  * per-iteration cost at the bench SF. Gated like the other perf
  * probes — recorded numbers live in
  * SCALING.md ("PageRank iteration economics").
  */
class PageRankPerfSpec extends SparkSpec {

  test("pagerank: per-iteration cost is corpus-independent after the edge build") {
    assume(sys.env.get("GRAFT_PERF_TESTS").contains("1"),
      "timing probe gated behind GRAFT_PERF_TESTS=1 (see SCALING.md for recorded numbers)")
    val d = "/root/testdata/sf0.1"
    val evs = graft.sources.Tables.events(spark, d)
      .withColumn("item", regexp_extract(col("props"), "(\\d+)", 1).cast("long"))
    var t0 = System.nanoTime
    val edges = GraphOps.transitionEdges(evs).localCheckpoint()
    val nEdges = edges.count()
    info(f"edge build: ${(System.nanoTime - t0) / 1e9}%.2f s, $nEdges edges")
    val nodes = evs.filter(col("item").isNotNull)
      .select(col("item")).distinct().localCheckpoint()
    val times = Seq(1, 5, 10).map { iters =>
      t0 = System.nanoTime
      GraphOps.pageRankOn(nodes, edges, iters).collect()
      val t = (System.nanoTime - t0) / 1e9
      info(f"iters=$iters%2d total=$t%.2f s")
      iters -> t
    }.toMap
    // 10 iterations must cost well under 10x one iteration (fixed small
    // per-iteration cost, not corpus-rescans)
    assert(times(10) < times(1) * 10)
  }
}
