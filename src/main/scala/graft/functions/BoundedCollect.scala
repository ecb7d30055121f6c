package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Bucket-bounded collect for LSH band expansion (MinHash / SimHash
  * near-dup candidate generation).
  *
  * `sort_array(collect_list(..))` + a post-filter on `size` bounds the
  * *output*, but its aggregation buffer is still bucket-sized — a
  * degenerate band value shared by 10^7 documents (template boilerplate
  * on a duplicate-heavy corpus) materializes all 10^7 entries in one
  * task's buffer before the filter ever sees the row. This aggregator
  * enforces the cap in the buffer itself: at most `cap` elements are ever
  * held, and the (cap+1)-th observation poisons the bucket to the empty
  * result — identical output to the collect-then-filter formulation
  * (size-in-(1, cap] buckets produce the same sorted array; everything
  * else produces an empty/filtered row), but with task memory bounded by
  * construction.
  *
  * Overflow is a function of the bucket's total COUNT only, not of
  * arrival order or partitioning: a partial overflows when it alone
  * exceeds `cap`, and a merge overflows when the combined size does —
  * so a bucket of n elements overflows iff n > cap, deterministically.
  *
  * Ordering: `finish` sorts, matching `sort_array`'s ascending order
  * (lexicographic on tuple/struct elements), so downstream i<j pair
  * expansion keeps its doc_a < doc_b-by-construction property.
  */
final class BoundedCollectAggregator[T: Ordering](cap: Int)(implicit seqEnc: Encoder[Seq[T]])
    extends Aggregator[T, (Boolean, Seq[T]), Seq[T]] {

  override def zero: (Boolean, Seq[T]) = (false, Vector.empty)

  override def reduce(b: (Boolean, Seq[T]), x: T): (Boolean, Seq[T]) =
    if (b._1) b
    else if (b._2.size >= cap) (true, Vector.empty)
    else (false, b._2 :+ x)

  override def merge(a: (Boolean, Seq[T]), b: (Boolean, Seq[T])): (Boolean, Seq[T]) =
    if (a._1 || b._1 || a._2.size + b._2.size > cap) (true, Vector.empty)
    else (false, a._2 ++ b._2)

  override def finish(b: (Boolean, Seq[T])): Seq[T] =
    if (b._1) Vector.empty else b._2.sorted

  override def bufferEncoder: Encoder[(Boolean, Seq[T])] =
    Encoders.tuple(Encoders.scalaBoolean, seqEnc)
  override def outputEncoder: Encoder[Seq[T]] = seqEnc
}
