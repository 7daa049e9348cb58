package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** One aligned observation of the two series. */
case class XyPair(x: Long, y: Long)

/** Unordered accumulation buffer (a Product, so `Encoders.product`
  * applies). Arrival order is irrelevant — the finish step imposes the
  * (x, y) sort — so reduce PREPENDS (O(1) on List) and merge concats. */
case class KnightBuf(items: Seq[XyPair])

/** Knight's O(d log d) Kendall building block (W. R. Knight, "A Computer
  * Method for Calculating Kendall's Tau with Ungrouped Data", JASA 1966):
  * the number of DISCORDANT pairs of a two-series sample, counted as
  * merge-sort inversions instead of the O(d²) pair join.
  *
  * After sorting the sample by (x ASC, y ASC), a pair i < j is a strict
  * y-inversion (y_i > y_j) iff x_i < x_j AND y_i > y_j — x-ties cannot
  * invert because equal-x runs are y-ascending under the sort, and each
  * unordered discordant pair {(x_i,y_i),(x_j,y_j)} has exactly one
  * orientation with the smaller x and the larger y. So the bottom-up
  * merge-sort inversion count over the y sequence IS nd, exactly, ties
  * included — integer, engine-portable, no float anywhere.
  *
  * Shape: reduce/merge accumulate the group's d observations (O(d)
  * buffer — the memory is a TIME-SPINE length, e.g. 87,600 points for a
  * decade of hours, never a corpus size); finish pays one O(d log d)
  * sort + merge cascade. The O(d²) work of the pair-join form never
  * happens on any path. Determinism: the count is invariant to arrival
  * and merge order (any permutation sorts to the same (x, y) sequence,
  * and ties within equal (x, y) cannot contribute inversions).
  */
class KendallInversionAggregator extends Aggregator[XyPair, KnightBuf, Long] {

  override def zero: KnightBuf = KnightBuf(Nil)

  override def reduce(b: KnightBuf, a: XyPair): KnightBuf =
    KnightBuf(a +: b.items)

  override def merge(a: KnightBuf, b: KnightBuf): KnightBuf =
    KnightBuf(a.items ++ b.items)

  override def finish(b: KnightBuf): Long = {
    val arr = b.items.toArray
    java.util.Arrays.sort(arr, (p: XyPair, q: XyPair) =>
      if (p.x != q.x) java.lang.Long.compare(p.x, q.x)
      else java.lang.Long.compare(p.y, q.y))
    val ys = arr.map(_.y)
    countInversions(ys)
  }

  /** Bottom-up merge sort over `ys`, counting STRICT inversions
    * (i < j, ys(i) > ys(j)); equal values never count (left run wins
    * ties, adding nothing). Mutates its argument — callers pass a
    * private copy. */
  private def countInversions(ys: Array[Long]): Long = {
    val n = ys.length
    if (n < 2) return 0L
    val tmp = new Array[Long](n)
    var inv = 0L
    var width = 1
    while (width < n) {
      var lo = 0
      while (lo < n - width) {
        val mid = lo + width
        val hi = math.min(lo + 2 * width, n)
        var i = lo; var j = mid; var k = lo
        while (i < mid && j < hi) {
          if (ys(i) <= ys(j)) { tmp(k) = ys(i); i += 1 }
          else { tmp(k) = ys(j); j += 1; inv += (mid - i) }
          k += 1
        }
        while (i < mid) { tmp(k) = ys(i); i += 1; k += 1 }
        while (j < hi) { tmp(k) = ys(j); j += 1; k += 1 }
        System.arraycopy(tmp, lo, ys, lo, hi - lo)
        lo += 2 * width
      }
      width *= 2
    }
    inv
  }

  override def bufferEncoder: Encoder[KnightBuf] = Encoders.product[KnightBuf]
  override def outputEncoder: Encoder[Long] = Encoders.scalaLong
}
