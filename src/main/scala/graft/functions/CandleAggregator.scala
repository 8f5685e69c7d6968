package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Input slice of a 5-minute candle (epoch micros + the four prices). */
case class CandleIn(start_us: Long, price_open: Int, price_high: Int,
                    price_low: Int, price_close: Int,
                    volume_traded: Double, trades_count: Int)

/** Merge buffer: tracks WHICH candle supplied open/close (earliest /
  * latest start), not just extreme prices.
  */
case class CandleBuf(first_us: Long, open: Int, last_us: Long, close: Int,
                     high: Int, low: Int, volume: Double, trades: Long)

case class CandleOut(open: Int, high: Int, low: Int, close: Int,
                     volume: Double, trades: Long)

/** Typed custom aggregation (SURVEY §2.10's extension slot): roll
  * 5-minute candles up to a coarser grain. OHLC semantics are NOT plain
  * aggregates — `open` is the open of the EARLIEST candle and `close`
  * the close of the LATEST — so the buffer carries the defining
  * timestamps and `merge` is order-independent (required: Spark merges
  * partial buffers in partition order, which is nondeterministic).
  * high/low/volume/trades fold as max/min/sum.
  *
  * Usage: `ds.groupByKey(dayOf).agg(CandleAggregator.toColumn)` or via
  * `udaf()` registration for DataFrame use.
  */
object CandleAggregator extends Aggregator[CandleIn, CandleBuf, CandleOut] {

  override def zero: CandleBuf =
    CandleBuf(Long.MaxValue, 0, Long.MinValue, 0,
      Int.MinValue, Int.MaxValue, 0.0, 0L)

  // Tie-break on equal timestamps by price value (min for open, max for
  // close): arbitrary but DETERMINISTIC — Spark merges partial buffers
  // in nondeterministic partition order, and the reference's T3
  // duplicate candles share start timestamps, so "whichever buffer came
  // first" would flip open/close between runs.
  private def pickFirst(tA: Long, pA: Int, tB: Long, pB: Int): Int =
    if (tA < tB || (tA == tB && pA <= pB)) pA else pB
  private def pickLast(tA: Long, pA: Int, tB: Long, pB: Int): Int =
    if (tA > tB || (tA == tB && pA >= pB)) pA else pB

  override def reduce(b: CandleBuf, c: CandleIn): CandleBuf =
    CandleBuf(
      first_us = math.min(b.first_us, c.start_us),
      open = pickFirst(b.first_us, b.open, c.start_us, c.price_open),
      last_us = math.max(b.last_us, c.start_us),
      close = pickLast(b.last_us, b.close, c.start_us, c.price_close),
      high = math.max(b.high, c.price_high),
      low = math.min(b.low, c.price_low),
      volume = b.volume + c.volume_traded,
      trades = b.trades + c.trades_count)

  override def merge(a: CandleBuf, b: CandleBuf): CandleBuf =
    CandleBuf(
      first_us = math.min(a.first_us, b.first_us),
      open = pickFirst(a.first_us, a.open, b.first_us, b.open),
      last_us = math.max(a.last_us, b.last_us),
      close = pickLast(a.last_us, a.close, b.last_us, b.close),
      high = math.max(a.high, b.high),
      low = math.min(a.low, b.low),
      volume = a.volume + b.volume,
      trades = a.trades + b.trades)

  override def finish(b: CandleBuf): CandleOut =
    CandleOut(b.open, b.high, b.low, b.close, b.volume, b.trades)

  override def bufferEncoder: Encoder[CandleBuf] = Encoders.product[CandleBuf]
  override def outputEncoder: Encoder[CandleOut] = Encoders.product[CandleOut]
}
