package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sources.Fixtures

class BloomUvSpec extends SparkSpec {

  // Independent re-implementation of the reference's hash
  // (UvWithBloomFilter.java:103-108) for the oracle.
  private def refOffset(value: String, seed: Int, capBits: Int): Long = {
    var r = 0L
    value.foreach(c => r = r * seed + c)
    r & ((1L << capBits) - 1)
  }

  test("bloom_uv equals the reference bitmap count, exactly") {
    GraftFunctions.register(spark)
    val ub = Fixtures.userBehavior(
      spark, s"$refBase/HotItemsAnalysis/src/main/resources/UserBehaviorTest.csv")

    val got = ub
      .filter(col("behavior") === "pv")
      .agg(GraftFunctions.bloomUv(col("userId")))
      .first().getLong(0)

    val expected = ub
      .filter(col("behavior") === "pv")
      .collect()
      .map(e => refOffset(e.userId.toString, 61, 29))
      .distinct.length
    assert(got === expected.toLong)
    assert(got === 10L) // 10 distinct users, no collisions at this scale
  }

  test("bloom_uv works from SQL and merges across shuffle partitions") {
    GraftFunctions.register(spark)
    import spark.implicits._
    // 100k synthetic ids over 20 partitions forces partial-buffer merges
    spark.range(0, 100000, 1, 20)
      .select((col("id") % 35000).as("userId"))
      .createOrReplaceTempView("ids")
    val got = spark.sql("SELECT bloom_uv(userId) FROM ids").first().getLong(0)
    val expected = (0L until 35000L).map(i => refOffset(i.toString, 61, 29)).distinct.length
    assert(got === expected.toLong)
    // at 35k ids over 2^29 slots collisions are rare but possible; the
    // aggregate must equal the single-threaded oracle regardless
    assert(got <= 35000L && got >= 34900L)
  }

  test("bloom_hash scalar (codegen) agrees with the aggregate's hash and the oracle") {
    GraftFunctions.register(spark)
    import spark.implicits._
    val ids = Seq("543462", "662867", "1035", "0", "", "9223372036854775807")
    val got = ids.toDF("s")
      .select(GraftFunctions.bloomHash(col("s")).as("h"))
      .collect().map(_.getLong(0)).toSeq
    val expected = ids.map(refOffset(_, 61, 29))
    assert(got === expected)
    // whole-stage codegen actually compiles it (no interpreted fallback) —
    // a range source keeps the projection in the physical plan (a local Seq
    // would constant-fold into a LocalTableScan)
    val plan = spark.range(10)
      .select(GraftFunctions.bloomHash(col("id")))
      .queryExecution.executedPlan.toString
    // the `*(n)` prefix marks a whole-stage-codegen'd operator in the
    // compact plan string; the Project hosting bloom_hash must carry it
    assert(plan.linesIterator.exists(l => l.contains("bloom_hash") && l.trim.startsWith("*(")), plan)
    // distinct bloom_hash values == bloom_uv over the same data
    spark.range(5000).select(col("id").cast("string").as("s")).createOrReplaceTempView("bh")
    val nOffsets = spark.sql("SELECT COUNT(DISTINCT bloom_hash(s)) FROM bh").first().getLong(0)
    val uv = spark.sql("SELECT bloom_uv(s) FROM bh").first().getLong(0)
    assert(nOffsets === uv)
  }

  test("bitmap buffer round-trips serialization and compresses dense runs") {
    val agg = BloomUvAggregate(org.apache.spark.sql.catalyst.expressions.Literal(1))
    val buf = agg.createAggregationBuffer()
    // a dense run: RoaringBitmap run-encodes it to O(1), where the old
    // boxed hash-set buffer serialized 8 bytes per offset (8 MB here)
    (0 until 1000000).foreach(buf.add)
    val bytes = agg.serialize(buf)
    assert(bytes.length < 64 * 1024, s"expected run-compressed buffer, got ${bytes.length}B")
    val back = agg.deserialize(bytes)
    assert(back.getLongCardinality === 1000000L)
    val other = agg.createAggregationBuffer()
    other.add(999999); other.add(1000001)
    assert(agg.merge(back, other).getLongCardinality === 1000001L)
  }

  test("bloom_uv per-window grouping reproduces the reference's per-window bitmaps") {
    GraftFunctions.register(spark)
    val ub = Fixtures.userBehavior(
      spark, s"$refBase/HotItemsAnalysis/src/main/resources/UserBehaviorTest.csv")
    val perWindow = ub
      .filter(col("behavior") === "pv")
      .groupBy(((col("timestamp") * 1000) - pmod(col("timestamp") * 1000, lit(3600000)) + 3600000)
        .as("windowEnd"))
      .agg(GraftFunctions.bloomUv(col("userId")).as("uv"))
      .collect()
      .map(r => r.getAs[Long]("windowEnd") -> r.getAs[Long]("uv"))
      .toMap
    assert(perWindow === Map(1511661600000L -> 9L, 1511665200000L -> 1L))
  }
}
