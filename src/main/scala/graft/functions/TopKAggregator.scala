package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Bounded top-K as a typed [[Aggregator]] — the `AggregateFunction →
  * Aggregator[IN, BUF, OUT]` mapping from SURVEY §2.10, applied to the
  * reference's Top-N shape (TopNHotItems, HotItems.java:140-197).
  *
  * The rank-over-window formulation ([[graft.operators.Windowed.topNPerWindow]])
  * sorts every (window, key) aggregate row inside each window partition;
  * that's the right plan when the rank input is already small. This
  * aggregator instead keeps a K-element bound in the aggregation buffer
  * itself — partial top-Ks merge associatively across partitions, so a
  * window with 10^8 distinct keys never materializes more than K rows per
  * partition. Use it when key cardinality per window is huge; use the
  * window rank when it isn't (simpler plan, whole-stage codegen).
  *
  * Ordering: count desc, then key asc — identical to the deterministic
  * tiebreak the rank formulation uses.
  */
final case class Scored(key: Long, cnt: Long)

final class TopKAggregator(k: Int)
    extends Aggregator[Scored, Seq[Scored], Seq[Scored]] {

  private def better(a: Scored, b: Scored): Boolean =
    a.cnt > b.cnt || (a.cnt == b.cnt && a.key < b.key)

  /** Insert keeping the buffer sorted best-first and bounded at k. The
    * buffer is tiny (≤ k) so linear insertion beats heap overhead.
    *
    * An EXACT duplicate of a resident pair is a no-op, which makes the
    * fold idempotent per element: an at-least-once upstream
    * redelivering a row (same key, same deterministic score — the
    * weighted-sample stream's draw keys are pure row functions) cannot
    * seat the same key twice and evict a distinct k-th member. An
    * element already evicted re-offers as worse-than-last and was
    * always a no-op; only the resident-duplicate case needed closing.
    * Same-key-DIFFERENT-score pairs still both insert — for rank
    * inputs that's the caller's contract to prevent (post-aggregation
    * rows are unique per key), not a case with one right answer here.
    */
  private def insert(buf: Seq[Scored], x: Scored): Seq[Scored] =
    if (buf.size >= k && better(buf.last, x)) buf
    else if (buf.contains(x)) buf
    else {
      val (front, back) = buf.span(better(_, x))
      (front :+ x) ++ back.take(k - front.size - 1)
    }

  override def zero: Seq[Scored] = Vector.empty

  override def reduce(buf: Seq[Scored], x: Scored): Seq[Scored] = insert(buf, x)

  override def merge(a: Seq[Scored], b: Seq[Scored]): Seq[Scored] =
    b.foldLeft(a)(insert)

  override def finish(buf: Seq[Scored]): Seq[Scored] = buf

  override def bufferEncoder: Encoder[Seq[Scored]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Scored]]()
  override def outputEncoder: Encoder[Seq[Scored]] = bufferEncoder
}
