package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Replica scaling probe for the search/learn packs: documents replicated
  * with shifted ids (corpus growth at fixed vocabulary — the search-index
  * regime). Gated like the other perf probes; recorded numbers live in
  * SCALING.md ("Search/learn replica sweep").
  */
class SearchScaleSpec extends SparkSpec {

  test("tf-idf search and linreg stats scale near-linearly in docs at 5x/25x") {
    assume(sys.env.get("GRAFT_PERF_TESTS").contains("1"),
      "timing probe gated behind GRAFT_PERF_TESTS=1 (see SCALING.md for recorded numbers)")
    import spark.implicits._
    val base = graft.sources.Tables.documents(spark, "/root/testdata/sf0.1")
      .select($"doc_id", $"text")
    def replicated(k: Int) = (0 until k)
      .map(i => base.withColumn("doc_id", $"doc_id" + lit(i * 10000000L)))
      .reduce(_ unionByName _).localCheckpoint()
    def time(f: => Long): Double = {
      val t0 = System.nanoTime; f; (System.nanoTime - t0) / 1e9
    }
    val terms = Seq("spark", "join", "window")
    for (k <- Seq(1, 1, 5, 25)) {
      val docsK = replicated(k)
      val tSearch = time {
        val postings = docsK
          .select($"doc_id", explode(TextOps.toks).as("t"))
          .filter($"t".isin(terms: _*))
          .groupBy($"doc_id", $"t").agg(count(lit(1)).as("tf"))
        val n = docsK.count()
        val df = postings.groupBy($"t").agg(count(lit(1)).as("df"))
          .withColumn("idf_ppm", expr(s"(${n}L * 1000000L) div df"))
        postings.join(broadcast(df.select($"t", $"idf_ppm")), "t")
          .groupBy($"doc_id").agg(sum($"tf" * $"idf_ppm").as("score_ppm"))
          .orderBy($"score_ppm".desc, $"doc_id").limit(15).count()
      }
      val tStats = time {
        // the linreg sufficient-statistics shape over the replicated corpus
        val feats = docsK
          .withColumn("tk", TextOps.toks)
          .select($"doc_id", explode(map(
            lit("data"), size(filter($"tk", x => x === lit("data"))).cast("long"),
            lit("__len__"), size($"tk").cast("long"),
            lit("__bias__"), lit(1L))).as(Seq("f", "x")))
        feats.select($"doc_id", $"f".as("fa"), $"x".as("xa"))
          .join(feats.select($"doc_id", $"f".as("fb"), $"x".as("xb")), "doc_id")
          .filter($"fa" <= $"fb")
          .groupBy($"fa", $"fb").agg(sum($"xa" * $"xb").as("s")).count()
      }
      info(f"k=$k%2d docs=${base.count() * k}%7d search=$tSearch%.2f s stats=$tStats%.2f s")
    }
    succeed
  }
}
