package graft.functions

import org.apache.spark.sql.Encoders
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.functions._

import graft.SparkSpec

class BoundedCollectSpec extends SparkSpec {

  private def bounded(cap: Int) = {
    implicit val seqEnc = ExpressionEncoder[Seq[Long]]()
    udaf(new BoundedCollectAggregator[Long](cap), Encoders.scalaLong)
  }

  test("in-cap buckets match sort_array(collect_list); over-cap buckets collapse to empty") {
    import spark.implicits._
    // key 1: 3 elements (kept, sorted); key 2: 7 elements (> cap -> empty);
    // key 3: exactly cap (kept) — spread over many partitions so partial
    // buffers merge across tasks
    val rows = Seq.tabulate(3)(i => (1L, 100L - i)) ++
      Seq.tabulate(7)(i => (2L, i.toLong)) ++
      Seq.tabulate(4)(i => (3L, 50L + i))
    val df = rows.toDF("k", "v").repartition(20)
    val got = df.groupBy($"k").agg(bounded(4)($"v").as("ids"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(got(1L) === Seq(98L, 99L, 100L)) // sorted ascending like sort_array
    assert(got(2L) === Seq.empty) // poisoned inside the buffer, never materialized
    assert(got(3L) === Seq(50L, 51L, 52L, 53L)) // boundary: size == cap kept
  }

  test("overflow depends only on the bucket count, not partitioning") {
    import spark.implicits._
    val rows = Seq.tabulate(5)(i => (9L, i.toLong))
    for (parts <- Seq(1, 3, 20)) {
      val got = rows.toDF("k", "v").repartition(parts)
        .groupBy($"k").agg(bounded(4)($"v").as("ids"))
        .collect().head.getSeq[Long](1)
      assert(got === Seq.empty, s"parts=$parts")
    }
    for (parts <- Seq(1, 3, 20)) {
      val got = Seq.tabulate(4)(i => (9L, i.toLong)).toDF("k", "v").repartition(parts)
        .groupBy($"k").agg(bounded(4)($"v").as("ids"))
        .collect().head.getSeq[Long](1)
      assert(got === Seq(0L, 1L, 2L, 3L), s"parts=$parts")
    }
  }
}
