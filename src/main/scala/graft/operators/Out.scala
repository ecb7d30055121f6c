package graft.operators

import org.apache.spark.sql.Dataset

/** Multi-output ADT replacing Flink's `OutputTag` side outputs (SURVEY
  * §1.1, §2.9): one `Dataset[Out[A]]` carries the main stream plus typed
  * side channels, and [[Out.split]] fans it into per-channel datasets for
  * independent sinks.
  *
  * In streaming, each split becomes its own query over the shared upstream
  * (`foreachBatch` can also tee one micro-batch to several sinks without
  * recomputation).
  */
final case class Out[A](channel: String, value: A)

object Out {
  val Main = "main"
  val Alert = "alert"
  val Late = "late"
  val Timeout = "timeout"
  val UnmatchedLeft = "unmatched-left"
  val UnmatchedRight = "unmatched-right"

  def main[A](value: A): Out[A] = Out(Main, value)
  def alert[A](value: A): Out[A] = Out(Alert, value)

  /** One filtered view per channel. Column-level filter + struct unnest so
    * the split stays inside Catalyst (codegen'd, channel predicate can push
    * down) rather than a lambda filter.
    */
  def split[A: org.apache.spark.sql.Encoder](
      ds: Dataset[Out[A]],
      channels: String*): Map[String, Dataset[A]] = {
    import org.apache.spark.sql.functions.col
    channels.map { ch =>
      ch -> ds.where(col("channel") === ch).select(col("value.*")).as[A]
    }.toMap
  }
}
