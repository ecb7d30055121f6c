package graft.operators

import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions.{expr, sum}

import graft.SparkSpec

/** The OTHER half of the skew story: `operators/Skew.scala` is the
  * explicit deterministic two-phase salting for aggregations whose
  * partials can't combine; for JOINS the engine's documented position is
  * to lean on AQE's runtime skew split (SCALING.md "skewed hot keys fall
  * to AQE skew handling"). Nothing verified that claim — this spec
  * builds a genuinely skewed sort-merge join at fixture scale (thresholds
  * lowered to match) and asserts the adaptive plan actually split the hot
  * partition (`skew=true` in the final SMJ), with results identical to
  * the unsplit join.
  */
class AqeSkewSpec extends SparkSpec {

  test("AQE splits the hot partition of a skewed sort-merge join at runtime") {
    import spark.implicits._
    val confs = Map(
      // fixture-sized skew: thresholds down, broadcast off so the join
      // stays a shuffled SMJ (the shape a fact-fact join has at scale)
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "100KB",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2.0",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "50KB",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false",
    )
    val saved = confs.keys.map(k => k -> spark.conf.getOption(k)).toMap
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      // one bot key carries 150k of 160k rows; the payload is an
      // INCOMPRESSIBLE per-row digest kept live through the join (skew
      // detection reads compressed map-output sizes, so a constant pad —
      // or a pruned-away one — deflates under the threshold)
      val left = spark.range(160000)
        .selectExpr(
          "CASE WHEN id < 150000 THEN 0L ELSE id % 64 END AS k",
          "md5(CAST(id AS STRING)) AS pad")
      val right = spark.range(64).selectExpr("id AS k", "id * 10 AS w")
      // downstream must NOT require the join's output partitioning: AQE
      // declines to split a skewed SMJ when the split would force an
      // extra exchange for a join-keyed consumer (e.g. groupBy(k) here) —
      // a global aggregate keeps the split shuffle-neutral
      val joined = left.join(right, "k")
        .agg(sum(expr("w + length(pad)")))
      val total = joined.collect().head.getLong(0)

      // correctness: the split must not duplicate or drop hot-key rows
      // (k=0 carries w=0; the tail ids contribute (id % 64) * 10 each;
      // every row adds its 32-char digest)
      assert(total ===
        (150000L until 160000L).map(id => (id % 64) * 10L).sum + 32L * 160000L)

      val adaptive = joined.queryExecution.executedPlan
        .collectFirst { case a: AdaptiveSparkPlanExec => a }
      assert(adaptive.nonEmpty, "expected an adaptive plan root")
      val finalPlan = adaptive.get.executedPlan.toString
      assert(finalPlan.contains("skew=true"),
        s"AQE did not mark the skewed join:\n$finalPlan")
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
