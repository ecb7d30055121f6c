package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One verifiable query: a Spark implementation over a scale-factor dir plus
  * (when SQL-expressible) an equivalent DuckDB oracle query on the same
  * parquet tables. The driver hash-compares both result sets with columns
  * sorted by name — so every computed column is aliased identically on both
  * sides, and outputs stick to types that hash identically across engines:
  *
  *   - integers / strings / booleans: always safe.
  *   - doubles: only when derived by *bit-identical* IEEE scalar ops on both
  *     sides (per-row arithmetic, or division of exactly-aggregated values).
  *     Order-dependent double aggregation (sum/avg over raw doubles) is
  *     avoided by aggregating `floor(x * 100)` cents as BIGINT instead.
  *   - event time: integral epoch seconds (`ts div 1e9` == `epoch_ms//1000`),
  *     never engine-formatted timestamps.
  *
  * Physical dtypes must match too, not just values: Spark's
  * row_number/size/bit_count emit INT (cast to BIGINT in the query), and
  * DuckDB's SUM(BIGINT) widens to HUGEINT (wrap every bigint SUM in
  * CAST(... AS BIGINT) in the oracle).
  */
final case class Q(
    name: String,
    spark: (SparkSession, String) => DataFrame,
    oracle: Option[String],
    /** Part of the Bench headline set (run at sf0.1 per round). */
    bench: Boolean = false,
)

object Catalog {
  def all: Seq[Q] =
    Relational.qs ++ EventAnalytics.qs ++ GraphOps.qs ++ TextOps.qs ++
      SearchOps.qs ++ LearnOps.qs ++ CurationOps.qs ++ VectorOps.qs ++
      MediaOps.qs ++ LayoutOps.qs

  lazy val queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map(q => q.name -> q.spark).toMap

  lazy val oracleSql: Map[String, String] =
    all.flatMap(q => q.oracle.map(q.name -> _)).toMap

  lazy val benchNames: Seq[String] = all.filter(_.bench).map(_.name)

  /** Queries whose formatted physical plans are published in PLANS.md.
    * Single source of truth for tools/dump_plans.scala (the generator)
    * and PlansDocSpec (the drift check that fails when a published
    * section no longer matches the live operator tree — regenerate via
    * tools/regen_plans.sh when it fires).
    */
  lazy val plannedNames: Seq[String] = Seq(
    "q1_pricing_summary", "q3_shipping_priority", "hot_items_topn",
    "hot_items_topk_agg", "t_minhash_lsh", "t_simhash_neardup",
    "t_clean_corpus", "v_knn_brute",
    "v_ivf_search", "v_ann_lsh_multi", "e_funnel_relaxed", "e_view_to_click",
    "e_asof_enrich", "t_contamination", "t_curate_corpus", "t_delta_dedup",
    "t_unigram_lm", "t_boilerplate", "t_delta_neardup", "v_kmeans_step",
    "t_seq_pack", "t_dedup_multimodal", "t_delta_semantic", "t_token_heavy",
    "v_pq_search", "t_substring_dup", "t_substring_scrub", "v_ivfpq_residual",
    "t_cluster_topics", "e_pagerank", "t_linreg_stats", "e_clustering",
    "e_item_cooccur", "e_attribution", "v_ivf_recall_trained", "t_token_drift",
    "t_bm25_search", "e_communities", "t_scd2_history", "t_proximity_search",
    "v_bq_search", "v_sq8_search", "t_temperature_mix", "v_cascade_search",
    "t_weighted_sample", "v_filtered_pairs")
}
