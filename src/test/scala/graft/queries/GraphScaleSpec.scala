package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Replica scaling probe for the behavioral-graph ops: events replicated
  * with SHIFTED user ids (more users, same item catalog — the realistic
  * growth axis) must scale the log-shuffle stages near-linearly while
  * the graph-sized stages stay flat. Gated like the other perf probes;
  * recorded numbers live in SCALING.md ("Graph-op replica sweep").
  */
class GraphScaleSpec extends SparkSpec {

  test("graph ops scale near-linearly in users at 5x replicas") {
    assume(sys.env.get("GRAFT_PERF_TESTS").contains("1"),
      "timing probe gated behind GRAFT_PERF_TESTS=1 (see SCALING.md for recorded numbers)")
    import spark.implicits._
    val d = "/root/testdata/sf0.1"
    val base = graft.sources.Tables.events(spark, d)
      .withColumn("item", regexp_extract($"props", "(\\d+)", 1).cast("long"))
      .filter($"item".isNotNull)
      .select($"user_id", $"ts_sec", $"event_id", $"item")

    def replicated(k: Int) = (0 until k)
      .map(i => base
        .withColumn("user_id", $"user_id" + lit(i * 1000000L))
        .withColumn("event_id", $"event_id" + lit(i * 1000000000L)))
      .reduce(_ unionByName _)
      .localCheckpoint()

    def time(f: => Long): Double = {
      val t0 = System.nanoTime; f; (System.nanoTime - t0) / 1e9
    }
    // first k=1 is a JVM/codegen warmup; read the second k=1 row
    for (k <- Seq(1, 1, 5, 25)) {
      val evs = replicated(k)
      val tEdges = time(GraphOps.transitionEdges(evs).count())
      val tCo = time {
        val ui = evs.select($"user_id", $"item").distinct()
        ui.select($"user_id", $"item".as("i1"))
          .join(ui.select($"user_id", $"item".as("i2")), "user_id")
          .filter($"i1" < $"i2")
          .groupBy($"i1", $"i2").agg(count(lit(1)).as("n")).count()
      }
      info(f"k=$k edges=$tEdges%.2f s cooccur=$tCo%.2f s rows=${evs.count()}")
    }
    succeed
  }
}
