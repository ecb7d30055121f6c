package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.exchange.ReusedExchangeExec

import graft.SparkSpec

/** Partition pruning — the dominant scan-cost lever at 100 TB, where fact
  * tables are laid out date-partitioned and a query touching one month
  * must read one month, not the table. The driver's sf* fixtures are
  * single unpartitioned files, so this spec writes the lineitem rows
  * date-partitioned itself and pins the two pruning paths:
  *
  *   - STATIC: a literal predicate on the partition column resolves at
  *     planning time — the scan's `PartitionFilters` carry it and the
  *     file listing shrinks to the matching directories;
  *   - DYNAMIC (DPP): a selective dimension-side filter prunes the fact
  *     scan at runtime through the join key — the mechanism that makes
  *     star-schema joins feasible when the fact side is partitioned on
  *     the join key and the dim filter is only known after planning.
  *
  * Both are Catalyst features the engine gets by declaring plans
  * relationally; the spec exists so a refactor that breaks the
  * declarative shape (e.g. wrapping the scan in an opaque UDF stage)
  * shows up as a pruning regression, not a silent 100x scan-cost cliff.
  */
class PartitionPruningSpec extends SparkSpec {

  /** All FileSourceScanExec leaves, descending through AQE roots and the
    * Spark-4 query-stage wrappers (whose wrapped plan is not a `child`).
    */
  private def scans(p: SparkPlan): Seq[FileSourceScanExec] = {
    val wrapped = p match {
      case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
      case q: QueryStageExec => Seq(q.plan)
      case r: ReusedExchangeExec => Seq(r.child)
      case _ => Seq.empty
    }
    (p match { case s: FileSourceScanExec => Seq(s); case _ => Seq.empty }) ++
      (wrapped ++ p.children).flatMap(scans)
  }

  @volatile private var built: Option[String] = None

  private lazy val dir: String = {
    val d = Files.createTempDirectory("graft-part").toString
    built = Some(d) // before the write: a failed build still gets cleaned up
    graft.sources.Tables.lineitem(spark, "/root/testdata/sf0.001")
      .withColumn("ship_month", date_format(col("l_shipdate"), "yyyy-MM"))
      .write.mode("overwrite").partitionBy("ship_month").parquet(s"$d/lineitem_p")
    d
  }

  override def afterAll(): Unit = {
    // delete only what a test actually created: touching the lazy val here
    // would WRITE the fixture during teardown (and mask the real failure
    // if the init throws)
    try built.foreach(d => org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(d)))
    finally super.afterAll()
  }

  test("static pruning: a month filter reaches PartitionFilters and shrinks the listing") {
    val part = spark.read.parquet(s"$dir/lineitem_p")
    val months = part.select("ship_month").distinct().count()
    assert(months > 12, s"fixture spans $months months — need a real partition spread")

    val q = part.filter(col("ship_month") === "1996-03").agg(sum("l_quantity"))
    val formatted = q.queryExecution
      .explainString(org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    val scanBlock = formatted.linesIterator
      .dropWhile(!_.contains("Scan parquet")).takeWhile(_.nonEmpty).mkString("\n")
    assert(formatted.contains("PartitionFilters"), formatted)
    assert(formatted.contains("1996-03"), formatted)
    // the partition predicate must NOT degrade to a post-scan Filter
    assert(!formatted.contains("PushedFilters: [IsNotNull(ship_month)"), formatted)

    // and it must actually read less: one month of files, not all of them
    q.collect()
    val prunedFiles = scans(q.queryExecution.executedPlan).map(_.selectedPartitions.partitionCount)
    assert(prunedFiles.nonEmpty && prunedFiles.head == 1,
      s"expected 1 of $months partitions selected, got $prunedFiles\n$scanBlock")

    // correctness: identical to the unpartitioned filter
    val flat = graft.sources.Tables.lineitem(spark, "/root/testdata/sf0.001")
      .filter(date_format(col("l_shipdate"), "yyyy-MM") === "1996-03")
      .agg(sum("l_quantity")).head.getDouble(0)
    assert(q.head.getDouble(0) === flat)
  }

  test("dynamic partition pruning: a dim filter prunes the fact scan through the join") {
    // partition the fact on the join key itself (the DPP-eligible layout):
    // orders bucketed to 16 orderkey groups as the 'partition date' stand-in
    val fact = graft.sources.Tables.lineitem(spark, "/root/testdata/sf0.001")
      .withColumn("okey_grp", pmod(col("l_orderkey"), lit(16)))
    fact.write.mode("overwrite").partitionBy("okey_grp").parquet(s"$dir/lineitem_dpp")
    val factP = spark.read.parquet(s"$dir/lineitem_dpp")

    val dim = graft.sources.Tables.orders(spark, "/root/testdata/sf0.001")
      .withColumn("okey_grp", pmod(col("o_orderkey"), lit(16)))
      .filter(col("o_orderpriority") === "1-URGENT" && col("o_orderkey") < 100)

    val q = factP.join(dim, Seq("okey_grp"))
      .groupBy("o_orderpriority").agg(sum("l_quantity").as("qty"))
    val formatted = q.queryExecution
      .explainString(org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(formatted.contains("dynamicpruning"),
      s"no dynamic pruning subquery in the fact scan:\n$formatted")

    // execute and confirm the runtime listing was pruned below 16
    q.collect()
    val factScans = scans(q.queryExecution.executedPlan)
      .filter(_.metadata.get("Location").exists(_.contains("lineitem_dpp")))
      .flatMap(_.metrics.get("numPartitions").map(_.value))
    assert(factScans.nonEmpty && factScans.head < 16,
      s"fact scan read $factScans of 16 partitions — DPP did not prune at runtime")
  }
}
