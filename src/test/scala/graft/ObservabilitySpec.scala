package graft

import org.apache.spark.sql.functions._

/** Pipeline observability without extra scans: `Dataset.observe` attaches
  * aggregate metrics that materialize DURING the action — the way a
  * production job reports row counts / checksums / null rates per stage
  * without re-reading 100 TB for a second aggregation pass.
  */
class ObservabilitySpec extends SparkSpec {

  test("observe collects row count and cents checksum in the same pass as the query") {
    import spark.implicits._
    val li = graft.sources.Tables.lineitem(spark, "/root/testdata/sf0.001")
      .select($"l_orderkey", floor($"l_extendedprice" * 100).cast("long").as("cents"))
      .observe("ingest_stats",
        count(lit(1)).as("n_rows"),
        sum($"cents").as("sum_cents"),
        sum(when($"cents".isNull, 1L).otherwise(0L)).as("n_null"))
    val agg = li.groupBy($"l_orderkey").agg(sum($"cents").as("order_cents"))

    val listened = new java.util.concurrent.atomic.AtomicReference[Map[String, Any]]()
    val listener = new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution, durationNs: Long): Unit = {
        qe.observedMetrics.get("ingest_stats").foreach { row =>
          listened.set(Map(
            "n_rows" -> row.getAs[Long]("n_rows"),
            "sum_cents" -> row.getAs[Long]("sum_cents"),
            "n_null" -> row.getAs[Long]("n_null")))
        }
      }
      override def onFailure(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution, e: Exception): Unit = ()
    }
    spark.listenerManager.register(listener)
    try {
      val orderTotal = agg.collect().map(r => r.getLong(1)).sum
      // listener fires asynchronously on the same thread pool; wait briefly
      val deadline = System.nanoTime + 10e9.toLong
      while (listened.get == null && System.nanoTime < deadline) Thread.sleep(50)
      val m = listened.get
      assert(m != null, "observed metrics never arrived")
      assert(m("n_rows") === 6000L)
      assert(m("n_null") === 0L)
      // the checksum observed mid-flight equals the downstream aggregate total
      assert(m("sum_cents") === orderTotal)
    } finally spark.listenerManager.unregister(listener)
  }
}
