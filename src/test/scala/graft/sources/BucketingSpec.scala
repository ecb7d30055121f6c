package graft.sources

import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._

import graft.SparkSpec

class BucketingSpec extends SparkSpec {

  /** Counts exchanges in the static plan. AQE is disabled around the
    * inspection — adaptive execution hides ShuffleExchangeExec inside leaf
    * query-stage nodes, which would undercount.
    */
  private def shuffleCount(mkDf: => org.apache.spark.sql.DataFrame): Int = {
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      def count(p: org.apache.spark.sql.execution.SparkPlan): Int = p match {
        case a: AdaptiveSparkPlanExec => count(a.executedPlan)
        case s: ShuffleExchangeExec => 1 + s.children.map(count).sum
        case other => other.children.map(count).sum
      }
      count(mkDf.queryExecution.executedPlan)
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }

  test("bucketed orderkey join runs with zero exchanges; unbucketed shuffles both sides") {
    val dir = "/root/testdata/sf0.001"
    // disable broadcast so the join strategy is the cluster-realistic
    // sort-merge path where bucketing matters
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      Bucketing.bucketOrderJoinTables(spark, dir, numBuckets = 4)
      val bucketed = spark.table("lineitem_b")
        .join(spark.table("orders_b"), col("l_orderkey") === col("o_orderkey"))
        .select("l_orderkey", "o_orderdate")
      val plain = Tables.lineitem(spark, dir)
        .join(Tables.orders(spark, dir), col("l_orderkey") === col("o_orderkey"))
        .select("l_orderkey", "o_orderdate")

      assert(shuffleCount(bucketed) === 0)
      assert(shuffleCount(plain) >= 2)
      // same results either way
      assert(bucketed.count() === plain.count())
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.sql("DROP TABLE IF EXISTS lineitem_b")
      spark.sql("DROP TABLE IF EXISTS orders_b")
    }
  }

  test("aggregation on the bucket key also skips the exchange") {
    val dir = "/root/testdata/sf0.001"
    try {
      Bucketing.writeBucketed(Tables.lineitem(spark, dir), "li_agg_b", "l_orderkey", 4)
      val agg = spark.table("li_agg_b").groupBy("l_orderkey").agg(count(lit(1)))
      assert(shuffleCount(agg) === 0)
    } finally spark.sql("DROP TABLE IF EXISTS li_agg_b")
  }
}
