package graft

import org.apache.spark.sql.functions._

import graft.model.OrderResult
import graft.operators.{OrderPayDetector, Out}
import graft.sources.Fixtures

/** The SQL surface (GraftCatalog) and the Out.split fan-out, pinned against
  * regressions — both are otherwise only exercised interactively.
  */
class GraftCatalogSpec extends SparkSpec {

  test("register exposes every table and the custom functions to spark.sql") {
    GraftCatalog.register(spark, "/root/testdata/sf0.001")
    assert(spark.sql("SELECT COUNT(*) FROM lineitem").first().getLong(0) === 6000L)
    // cross-table join through the views
    val top = spark.sql("""
      SELECT n_name, COUNT(*) c FROM customer JOIN nation ON c_nationkey = n_nationkey
      GROUP BY 1 ORDER BY c DESC, n_name LIMIT 1""").first()
    assert(top.getLong(1) > 0)
    // derived events views
    assert(spark.sql("SELECT COUNT(*) FROM events WHERE ts_sec IS NULL").first().getLong(0) === 0L)
    assert(!spark.sql("SELECT MIN(event_time) FROM events_timed").first().isNullAt(0))
    // custom functions reachable from SQL
    assert(spark.sql("SELECT bloom_uv(user_id) FROM events").first().getLong(0) === 15L)
    assert(spark.sql("SELECT bloom_hash('543462')").first().getLong(0) === 398203944L)
    assert(spark.sql(
      "SELECT dot_d(embedding, embedding) FROM embeddings WHERE vec_id = 0").first().getDouble(0) > 0.0)
    // the double-array sibling equals the HOF fold it replaced, bit for bit
    // (left-to-right from a 0.0 seed — the SQ8 hash-gate's IEEE sequence),
    // and matches the HOF's null-on-length-mismatch semantics
    val ddRow = spark.sql("""
      SELECT dot_dd(d, d) AS a,
             aggregate(zip_with(d, d, (x, y) -> x * y), 0D, (acc, v) -> acc + v) AS b,
             dot_dd(d, array(1.0D)) AS short
      FROM (SELECT transform(embedding, x -> CAST(x AS DOUBLE)) AS d
            FROM embeddings WHERE vec_id = 0)""").first()
    assert(ddRow.getDouble(0) === ddRow.getDouble(1) && ddRow.getDouble(0) > 0.0)
    assert(ddRow.isNullAt(2))
    // typed aggregators reachable from SQL: bounded gather + bounded top-k
    assert(spark.sql(
      "SELECT size(bounded_collect(user_id)) FROM (SELECT user_id FROM events LIMIT 10)")
      .first().getInt(0) === 10)
    // a group past the 2^10 cap poisons to empty rather than materializing
    assert(spark.sql(
      "SELECT size(bounded_collect(CAST(x AS BIGINT))) FROM (SELECT explode(sequence(1, 2000)) AS x)")
      .first().getInt(0) === 0)
    val topScored = spark.sql(
      "SELECT topk_scored(user_id, event_id) AS t FROM events").first().getSeq[org.apache.spark.sql.Row](0)
    assert(topScored.length === 5)
  }

  test("re-registering over another SF repoints the views") {
    GraftCatalog.register(spark, "/root/testdata/sf0.001")
    assert(spark.sql("SELECT COUNT(*) FROM orders").first().getLong(0) === 1500L)
    GraftCatalog.register(spark, "/root/testdata/sf0.01")
    assert(spark.sql("SELECT COUNT(*) FROM orders").first().getLong(0) === 15000L)
  }

  test("Out.split fans one detector output into per-channel datasets") {
    implicit val enc = org.apache.spark.sql.Encoders.product[OrderResult]
    val orders = Fixtures.orders(
      spark, s"$refBase/OrderPayDetect/src/main/resources/OrderLog.csv")
    val out = OrderPayDetector.batch(orders, timeoutSec = 900)
    val channels = Out.split(out, Out.Main, Out.Timeout)
    val mains = channels(Out.Main).collect()
    val timeouts = channels(Out.Timeout).collect()
    assert(mains.length + timeouts.length === out.count().toInt)
    assert(mains.forall(_.resultState == OrderPayDetector.Success))
    assert(timeouts.forall(_.resultState != OrderPayDetector.Success))
  }
}
