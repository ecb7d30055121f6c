package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** One sketch entry: a surviving token and its (under-)estimated count. */
final case class TokenEst(token: String, est: Long)

/** Misra-Gries heavy-hitter sketch as a typed [[Aggregator]] — the
  * frequent-elements counterpart of the approximate-distinct pair
  * (`approx_count_distinct` / [[BloomUvAggregate]]): k counters per
  * aggregation buffer, never the vocabulary.
  *
  * Why it matters at 100 TB: the exact token top-k
  * ([[graft.queries.TextOps]] `t_token_topk`) must shuffle one row per
  * DISTINCT token — fine for words, hostile for 12-gram vocabularies in
  * the trillions. This sketch's partial states are k entries per
  * partition regardless of vocabulary, merged associatively on the
  * reduce side, so the exchange carries O(k x partitions) rows total.
  *
  * Guarantees (the mergeable-summaries bound — Agarwal, Cormode,
  * Huang, Phillips, Wei, Yi, "Mergeable Summaries", PODS'12, §3: MG
  * summaries merge with NO loss of the one-pass bound):
  *
  *   - est(t) <= true(t)                 (counters only ever undercount)
  *   - true(t) - est(t) <= N/(k+1)       (N = total stream length)
  *   - any t with true(t) > N/(k+1) survives in the sketch
  *
  * The surviving SET and the estimates depend on Spark's partition/merge
  * order, so catalog queries must gate on the order-independent
  * guarantees above (booleans), never on raw sketch contents — the same
  * discipline as `uv_approx`'s banded accuracy check.
  *
  * The buffer is an immutable Map (persistent HashMap: effectively O(1)
  * updated/get per token). The eviction paths are O(k) but amortized:
  * decrement-all consumes k prior increments, and the merge cut runs
  * once per PAIR of partials, not per row.
  */
final class MisraGriesAggregator(k: Int)
    extends Aggregator[String, Map[String, Long], Seq[TokenEst]] {

  require(k >= 1, s"k=$k: need at least one counter")

  override def zero: Map[String, Long] = Map.empty

  override def reduce(b: Map[String, Long], t: String): Map[String, Long] =
    b.get(t) match {
      case Some(c)            => b.updated(t, c + 1L)
      case None if b.size < k => b.updated(t, 1L)
      case None => // classic MG eviction: decrement all, drop the zeroed
        b.flatMap { case (kk, c) => if (c > 1L) Some(kk -> (c - 1L)) else None }
    }

  override def merge(a: Map[String, Long], b: Map[String, Long]): Map[String, Long] = {
    val sum = b.foldLeft(a) { case (m, (kk, c)) => m.updated(kk, m.getOrElse(kk, 0L) + c) }
    if (sum.size <= k) sum
    else {
      // Mergeable-summaries merge: subtract the (k+1)-th largest count
      // from every counter and drop the non-positive — at most k counters
      // can exceed the (k+1)-th largest, so the bound re-establishes
      val cut = sum.values.toSeq.sorted(Ordering[Long].reverse).apply(k)
      sum.flatMap { case (kk, c) => if (c > cut) Some(kk -> (c - cut)) else None }
    }
  }

  /** Deterministic ORDER (est desc, token asc) for stable downstream
    * explodes; the CONTENT is still merge-order-dependent — see scaladoc.
    */
  override def finish(b: Map[String, Long]): Seq[TokenEst] =
    b.toSeq.map { case (t, c) => TokenEst(t, c) }
      .sortBy(x => (-x.est, x.token))

  override def bufferEncoder: Encoder[Map[String, Long]] = ExpressionEncoder()
  override def outputEncoder: Encoder[Seq[TokenEst]] = ExpressionEncoder()
}
