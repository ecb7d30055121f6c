package graft

import org.apache.spark.sql.SparkSession

import graft.functions.GraftFunctions
import graft.sources.Tables

/** SQL-surface entry point (SURVEY §2.10 Q1/Q5): registers every
  * scale-factor table as a temp view plus graft's custom functions, so the
  * whole engine is reachable from `spark.sql(...)` — the analog of the
  * reference's `createTemporaryView` + Blink SQL path, with Catalyst as the
  * only planner.
  */
object GraftCatalog {

  val tableNames: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "documents", "embeddings")

  /** Registers `<name>` views over `dir` plus `events` (with the derived
    * event-time columns) and the custom function registry.
    */
  def register(spark: SparkSession, dir: String): Unit = {
    // embeddings goes through its guarded loader (array<float> pin), not
    // the raw scan — the SQL surface must survive a float64 regen exactly
    // like the programmatic one
    tableNames.filterNot(_ == "embeddings")
      .foreach(n => Tables(spark, dir, n).createOrReplaceTempView(n))
    Tables.embeddings(spark, dir).createOrReplaceTempView("embeddings")
    Tables.events(spark, dir).createOrReplaceTempView("events")
    Tables.eventsTimed(spark, dir).createOrReplaceTempView("events_timed")
    GraftFunctions.register(spark)
  }
}
