package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** One scored row for [[TopKAggregator]]. */
case class ScoredId(score: Double, id: Long)

/** Bounded buffer wrapper (a Product, so `Encoders.product` applies). */
case class TopKBuf(items: Seq[ScoredId])

/** Per-group top-k as a typed Aggregator with a BOUNDED buffer
  * (SURVEY.md §2.10 "per-group top-k heap"): the window-function
  * formulation (`row_number() <= k`) sorts every group in full before
  * discarding all but k rows; this aggregator carries at most k entries
  * per group through partial (map-side) and final aggregation, so the
  * shuffle moves k rows per (partition, group) instead of the whole
  * group — the difference between O(n log n) sort volume and O(n log k)
  * heap maintenance at 100 TB group sizes.
  *
  * Determinism: ordering is (score DESC, id ASC) — a total order, so the
  * result is independent of row arrival and partition merge order, the
  * same discipline as [[graft.ts.CandleAggregator]].
  */
class TopKAggregator(k: Int) extends Aggregator[ScoredId, TopKBuf, Seq[ScoredId]] {

  private def lt(a: ScoredId, b: ScoredId): Boolean =
    a.score > b.score || (a.score == b.score && a.id < b.id)

  override def zero: TopKBuf = TopKBuf(Seq.empty)

  override def reduce(b: TopKBuf, a: ScoredId): TopKBuf = {
    // buffers stay sorted; a candidate below a full buffer's floor is
    // rejected in O(1) without allocation (the common case at scale),
    // an accepted one spliced at its position in O(k) — no re-sort
    if (b.items.size >= k && !lt(a, b.items.last)) b
    else {
      val (before, after) = b.items.span(lt(_, a))
      TopKBuf(((before :+ a) ++ after).take(k))
    }
  }

  override def merge(a: TopKBuf, b: TopKBuf): TopKBuf =
    if (b.items.isEmpty) a
    else if (a.items.isEmpty) b
    else { // two sorted runs: linear merge, stop at k
      val out = Seq.newBuilder[ScoredId]
      var (x, y, n) = (a.items, b.items, 0)
      while (n < k && (x.nonEmpty || y.nonEmpty)) {
        if (y.isEmpty || (x.nonEmpty && lt(x.head, y.head))) {
          out += x.head; x = x.tail
        } else { out += y.head; y = y.tail }
        n += 1
      }
      TopKBuf(out.result())
    }

  override def finish(b: TopKBuf): Seq[ScoredId] = b.items

  override def bufferEncoder: Encoder[TopKBuf] = Encoders.product[TopKBuf]
  override def outputEncoder: Encoder[Seq[ScoredId]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[ScoredId]]()
}
