package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.joins.BroadcastHashJoinExec

import graft.queries.Catalog

/** Physical-plan regression checks — the 100 TB properties the code
  * comments promise, asserted against the actual optimized plans:
  * predicate pushdown into the parquet scan, broadcast (not shuffle) joins
  * for dimension tables, bounded shuffle counts.
  */
class PlanSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def plan(name: String): SparkPlan =
    Catalog.queries(name)(spark, sf).queryExecution.executedPlan

  private def collectAll[T](p: SparkPlan)(pf: PartialFunction[SparkPlan, T]): Seq[T] = {
    val expanded = p.collect {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case other => other
    }
    (p +: expanded).flatMap(_.collect(pf))
  }

  private def formatted(name: String): String = {
    val df: DataFrame = Catalog.queries(name)(spark, sf)
    df.queryExecution.explainString(org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
  }

  test("q1: ship-date filter reaches the parquet scan; only needed columns read") {
    val s = formatted("q1_pricing_summary")
    assert(s.contains("PushedFilters"), s)
    assert(s.contains("LessThanOrEqual(l_shipdate"), s)
    // projection pruning: orderkey isn't referenced, so it must not be read
    val readSchema = s.linesIterator.filter(_.contains("ReadSchema")).mkString
    assert(!readSchema.contains("l_orderkey"), readSchema)
  }

  test("q3: both dimension joins broadcast; the fact scan is never shuffled pre-agg") {
    val s = formatted("q3_shipping_priority")
    assert("BroadcastHashJoin".r.findAllIn(s).size >= 2, s)
    assert(s.contains("PushedFilters"), s)
    assert(s.contains("GreaterThan(l_shipdate"), s)
  }

  test("q5: snowflake dims broadcast around the lineitem scan") {
    val s = formatted("q5_nation_revenue")
    assert(collectAll(plan("q5_nation_revenue")) { case b: BroadcastHashJoinExec => b }.nonEmpty)
    assert(s.contains("IsNotNull(o_orderdate)") || s.contains("GreaterThanOrEqual(o_orderdate"), s)
  }

  test("hot_items_topn: single aggregation shuffle before the rank") {
    // explode → partial agg → ONE exchange → final agg → window rank.
    val shuffles = collectAll(plan("hot_items_topn")) { case e: ShuffleExchangeExec => e }
    // one for the agg, one for the window partition — anything more means a
    // planning regression (e.g. lost partial aggregation)
    assert(shuffles.size <= 2, shuffles.mkString("\n"))
  }

  test("hot_items_topk_agg: bounded partial top-k merge, no per-window sort") {
    // the TopKAggregator formulation must plan as partial ObjectHashAggregate
    // (<= K rows of buffer per partition) + one exchange — never a rank
    // window or a sort of the full (window, item) aggregate
    val s = plan("hot_items_topk_agg").toString
    assert(s.contains("ObjectHashAggregate"), s)
    assert(s.contains("partial_topkaggregator"), s)
    assert(!s.contains("Window"), s)
    assert(!s.contains("Sort "), s)
  }

  test("token top-k: distributed TakeOrderedAndProject, no single-partition rank") {
    // the global top-20 must never funnel the full vocabulary through one
    // task: the rank comes from a per-partition partial top-k (limit after
    // sort), not an unpartitioned Window
    import graft.queries.TextOps
    for (df <- Seq(
        TextOps.rankedTokenAgg(spark, TextOps.wsTokenRows(spark, sf)),
        TextOps.rankedTokenAgg(spark, TextOps.bpeTokenRows(spark, sf)))) {
      val s = df.queryExecution.executedPlan.toString
      assert(s.contains("TakeOrderedAndProject"), s)
      assert(!s.contains("SinglePartition"), s)
      assert(!s.contains("Window"), s)
    }
  }

  test("e_funnel_relaxed: counting scan — no join of any kind in the plan") {
    // followedBy-all-matches as a per-user counting scan
    // (Funnel.countTriplesBatch): one repartition on user_id + in-partition
    // sort feeding a streaming mapPartitions boundary scan, never the
    // triple-enumerating join pair whose within-key output is cubic in
    // hot-user activity (and never a per-group buffer either)
    val s = formatted("e_funnel_relaxed")
    assert(!s.toLowerCase.contains("join"), s)
    assert(s.contains("MapPartitions"), s)
    assert(s.contains("Sort"), s)
  }

  test("e_view_to_click: secondary-sort scan — no join, no per-group buffering") {
    // generic relaxed CEP (Cep.followedByBatch): same staging as the
    // funnel — repartition on key + spillable in-partition sort feeding a
    // streaming mapPartitions boundary scan. Never MapGroups (whose
    // flatMapGroups would materialize a hot key's full history in one
    // task's heap) and never a join.
    val s = formatted("e_view_to_click")
    assert(!s.toLowerCase.contains("join"), s)
    assert(!s.contains("MapGroups"), s)
    assert(s.contains("MapPartitions"), s)
    assert(s.contains("Sort"), s)
  }

  test("t_minhash_lsh: band join is an equi-join, never a cartesian product") {
    val s = formatted("t_minhash_lsh")
    assert(!s.contains("CartesianProduct"), s)
    assert(!s.contains("BroadcastNestedLoopJoin"), s)
  }

  test("v_knn_brute: the big side is scanned once and never exchange-shuffled before scoring") {
    val s = formatted("v_knn_brute")
    // query side broadcasts (5 rows); candidate side streams through
    assert(s.contains("BroadcastNestedLoopJoin") || s.contains("BroadcastHashJoin"), s)
  }

  test("q6: every predicate pushes to the scan; no data-row shuffle") {
    val s = formatted("q6_forecast_revenue")
    assert(s.contains("PushedFilters"), s)
    assert(s.contains("GreaterThanOrEqual(l_shipdate"), s)
    assert(s.contains("GreaterThanOrEqual(l_discount"), s)
    assert(s.contains("LessThan(l_quantity"), s)
    // single partial->final agg: the only exchange carries one row/partition
    val shuffles = collectAll(plan("q6_forecast_revenue")) { case e: ShuffleExchangeExec => e }
    assert(shuffles.size <= 1, shuffles.mkString("\n"))
  }

  test("t_clean_corpus: near-dup removal is a broadcast-able anti-join, no cartesian") {
    val s = formatted("t_clean_corpus")
    assert(!s.contains("CartesianProduct"), s)
    assert(!s.contains("BroadcastNestedLoopJoin"), s)
    // the removed-id set anti-joins against survivors (LeftAnti in-plan)
    assert(s.contains("LeftAnti"), s)
  }

  test("v_knn_brute: dot_d scoring stays inside whole-stage codegen") {
    // the similarity kernel must not fall back to interpreted evaluation —
    // the *(n) marker on the operator hosting dot_d proves fusion. AQE only
    // materializes codegen stages once executed, so run the query first.
    val df = Catalog.queries("v_knn_brute")(spark, sf)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    // tree-drawing prefixes (`+- `) precede the `*(n)` marker on nested
    // operators, so match the marker anywhere on the dot_d line
    assert(p.linesIterator.exists(l => l.contains("dot_d") && l.contains("*(")), p)
  }
}
