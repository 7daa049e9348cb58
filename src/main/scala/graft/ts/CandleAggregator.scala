package graft.ts

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** One-pass typed OHLCV aggregator (SURVEY.md §2.10 showcase): the whole
  * candle is a single reduce/merge-able buffer, so Catalyst runs it as a
  * partial (map-side) + final aggregation — one shuffle of one small
  * buffer per (bucket, series) group, the same plan shape as the
  * min_by/max_by formulation but in one typed pass.
  *
  * Input rows are (epochMicros, value); open/close track their
  * timestamps through merges, making the result independent of row and
  * partition order (the determinism rule that bans first()/last()).
  */
case class CandleBuf(
    openTs: Long, open: Double,
    closeTs: Long, close: Double,
    high: Double, low: Double,
    volume: Double, trades: Long)

case class Candle(open: Double, high: Double, low: Double, close: Double,
                  volume: Double, trades: Long)

object CandleAggregator extends Aggregator[(Long, Double), CandleBuf, Candle] {

  override def zero: CandleBuf =
    CandleBuf(Long.MaxValue, 0.0, Long.MinValue, 0.0,
      Double.NegativeInfinity, Double.PositiveInfinity, 0.0, 0L)

  // lexicographic (ts, value) extrema: deterministic even when two rows
  // share a timestamp. NOTE the grading contract in TsQueries: the DuckDB
  // oracle's arg_min/arg_max tie-break on duplicate ts is engine-
  // arbitrary, so the hash-match additionally relies on the fixture
  // guarantee of unique (series, ts) — verified at every SF. This
  // aggregator stays fully determined even without that guarantee.
  private def earlier(ts1: Long, v1: Double, ts2: Long, v2: Double): Boolean =
    ts1 < ts2 || (ts1 == ts2 && v1 <= v2)

  override def reduce(b: CandleBuf, row: (Long, Double)): CandleBuf = {
    val (ts, v) = row
    val openFromRow = earlier(ts, v, b.openTs, b.open)
    val closeFromRow = !earlier(ts, v, b.closeTs, b.close)
    CandleBuf(
      if (openFromRow) ts else b.openTs,
      if (openFromRow) v else b.open,
      if (closeFromRow) ts else b.closeTs,
      if (closeFromRow) v else b.close,
      math.max(b.high, v), math.min(b.low, v),
      b.volume + v, b.trades + 1L)
  }

  override def merge(a: CandleBuf, b: CandleBuf): CandleBuf = {
    if (b.trades == 0L) a
    else if (a.trades == 0L) b
    else {
      val openFromA = earlier(a.openTs, a.open, b.openTs, b.open)
      val closeFromA = !earlier(a.closeTs, a.close, b.closeTs, b.close)
      CandleBuf(
        if (openFromA) a.openTs else b.openTs,
        if (openFromA) a.open else b.open,
        if (closeFromA) a.closeTs else b.closeTs,
        if (closeFromA) a.close else b.close,
        math.max(a.high, b.high), math.min(a.low, b.low),
        a.volume + b.volume, a.trades + b.trades)
    }
  }

  override def finish(b: CandleBuf): Candle =
    Candle(b.open, b.high, b.low, b.close, b.volume, b.trades)

  override def bufferEncoder: Encoder[CandleBuf] = Encoders.product[CandleBuf]
  override def outputEncoder: Encoder[Candle] = Encoders.product[Candle]
}
