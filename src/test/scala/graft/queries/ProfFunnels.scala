package graft.queries

import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec

/** One-off audit tool: for each named catalog query, print the CHILD of
  * every Exchange SinglePartition in its executed plan — the relation
  * that would funnel through one task — so each sanction entry in
  * CatalogPlanGuardSpec is grounded in what actually flows.
  */
object ProfFunnels {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.local()
    val sf = "/root/testdata/sf0.001"
    val names = args.toSeq
    names.foreach { n =>
      val p = Catalog.queries(n)(spark, sf).queryExecution.executedPlan
      val all: Seq[SparkPlan] = (p +: p.collect {
        case a: AdaptiveSparkPlanExec => a.executedPlan
        case o => o
      })
      val funnels = all.flatMap(_.collect {
        case e: ShuffleExchangeExec if e.outputPartitioning.numPartitions == 1 => e
      })
      println(s"===== $n: ${funnels.size} single-partition exchange(s)")
      funnels.zipWithIndex.foreach { case (e, i) =>
        val child = e.child.toString.linesIterator.take(3).mkString("\n  ")
        println(s"  [$i] child: $child")
      }
    }
    spark.stop()
  }
}
