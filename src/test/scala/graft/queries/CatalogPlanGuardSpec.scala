package graft.queries

import graft.SparkSpec

/** Blanket plan guard over the ENTIRE catalog — every query, not just the
  * PlanSpec headliners: the two plan shapes that are never acceptable at
  * 100 TB must not appear anywhere, so a refactor that degrades a
  * non-headline query (a lost equi-join key quietly turning a band join
  * into a cross product, a window losing its partition spec) fails the
  * suite instead of surfacing as a cluster incident.
  *
  * - `CartesianProduct` / unbounded `BroadcastNestedLoopJoin`: candidate
  *   generation throughout the catalog is equi-join on derived keys
  *   (band, bucket, cell, shingle). The ONLY sanctioned BNLJ is the
  *   brute-force/IVF ANN family, where joining a provably tiny broadcast
  *   side (the fixed query/centroid set) against every row IS the
  *   operator's semantic, and the big side streams through exactly once.
  * - `SinglePartition` exchanges: nothing in the catalog funnels data
  *   rows through one task — global ranks are TakeOrderedAndProject,
  *   global prefix sums are distributed (t_shard_pack), and scalar
  *   aggregates pre-aggregate to one row per partition before any
  *   single-partition step would matter. Empirically the string appears
  *   in NO catalog plan; this pins that for every query, present and
  *   future.
  */
class CatalogPlanGuardSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  /** Broadcast side is the bounded query/centroid set — see class doc.
    * `t_unigram_lm` / `t_collocations` / `t_token_heavy` are sanctioned
    * tighter still: their broadcast side is the ONE-row corpus-total
    * scalar crossed onto the scored stream.
    */
  private val bnljSanctioned =
    Set("v_knn_brute", "v_ivf_assign", "v_ivf_search", "v_ivf_nprobe",
      "v_ivf_recall", "v_kmeans_step", "t_semantic_dedup", "t_dedup_multimodal",
      "t_delta_semantic", "t_unigram_lm", "t_collocations", "t_token_heavy",
      "v_cluster_balance", "t_dsir_weight", "t_tfidf_topk",
      // PQ recall audit: same exact-ground-truth shape as v_ivf_recall —
      // the broadcast side is the fixed 5-query panel; the composed
      // IVF-PQ search inherits the centroid-assignment cross from the
      // IVF family (broadcast side = the 16 centroids)
      "v_pq_recall", "v_ivfpq_search", "v_ivfpq_residual",
      // cluster topics: centroid-assignment cross + the one-row corpus total
      "t_cluster_topics",
      // CCNet buckets compose the unigram-LM core, inheriting its
      // sanctioned one-row corpus-total cross
      "t_ccnet_buckets",
      // index balance/drift inherit the IVF family's centroid-assignment
      // cross; drift adds the one-row totals scalar cross
      "v_index_balance", "v_index_drift", "t_token_drift",
      // trained-centroid recall audits: same centroid-assignment cross +
      // fixed-query-panel truth as v_ivf_recall/v_pq_recall, centroids
      // and codebooks from kmeansTrain
      "v_ivf_recall_trained", "v_pq_recall_trained",
      // hybrid retrieval: the dense list scores the corpus against a
      // 1-row broadcast probe vector — the v_knn_brute shape at its
      // smallest possible broadcast side
      "t_rrf_fusion",
      // compressed-tier searches + their recall audits: identical
      // fixed-5-query broadcast panel as v_knn_brute (the sq8 pair adds
      // the 1-row quantization-stats cross)
      "v_bq_search", "v_bq_recall", "v_sq8_search", "v_sq8_recall",
      "v_mrl_recall",
      // filtered ANN + MMR pool build: the v_knn_brute broadcast-panel
      // probe (MMR's greedy rounds are equi-joins on query_id)
      "v_filtered_ann", "v_mmr_rerank",
      // stored-index time travel + hybrid: both run the stored ADC
      // search, whose probe step is the IVF family's sanctioned
      // centroid-assignment cross (queries x 16 broadcast centroids);
      // the hybrid adds nothing else unkeyed (the fuse is a full-outer
      // equi-join of two <= pool-row lists)
      "v_ivfpq_asof", "t_hybrid_from_index")

  test("no catalog query plans a cartesian, a rogue BNLJ, or a single-partition stage") {
    val offenders = Catalog.all.flatMap { q =>
      val plan = q.spark(spark, sf).queryExecution.sparkPlan.toString
      val bad = Seq(
        "CartesianProduct" -> plan.contains("CartesianProduct"),
        "SinglePartition" -> plan.contains("SinglePartition"),
        "BroadcastNestedLoopJoin" ->
          (plan.contains("BroadcastNestedLoopJoin") && !bnljSanctioned(q.name)),
      ).collect { case (label, true) => label }
      if (bad.isEmpty) None else Some(s"${q.name}: ${bad.mkString(", ")}")
    }
    assert(offenders.isEmpty, s"scale-hostile plan shapes:\n${offenders.mkString("\n")}")
    // the sanctioned BNLJs still exist (the guard keeps meaning something)
    assert(bnljSanctioned.subsetOf(Catalog.all.map(_.name).toSet))
  }
}
