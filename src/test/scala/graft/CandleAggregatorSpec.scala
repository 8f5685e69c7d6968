package graft

import graft.functions.{CandleAggregator, CandleIn}

class CandleAggregatorSpec extends SparkSpec {
  import spark.implicits._

  private val candles = Seq(
    // out of chronological order on purpose — open/close must follow
    // event time, not encounter order
    CandleIn(300, 20, 25, 19, 21, 2.0, 10),
    CandleIn(100, 10, 15, 9, 12, 1.0, 5),
    CandleIn(200, 12, 30, 8, 20, 3.0, 7))

  test("daily rollup takes open from earliest, close from latest candle") {
    val out = spark.createDataset(candles)
      .groupByKey(_ => 1)
      .agg(CandleAggregator.toColumn)
      .collect().head._2
    assert(out.open == 10) // candle at t=100
    assert(out.close == 21) // candle at t=300
    assert(out.high == 30 && out.low == 8)
    assert(out.volume == 6.0 && out.trades == 22L)
  }

  test("merge is order-independent across partitionings") {
    val results = Seq(1, 2, 3).map { p =>
      spark.createDataset(candles).repartition(p)
        .groupByKey(_ => 1).agg(CandleAggregator.toColumn)
        .collect().head._2
    }
    assert(results.distinct.size == 1, results.toString)
  }

  test("duplicate-timestamp candles resolve deterministically across partitionings") {
    // the reference's T3 re-fetch duplicates: same start, revised close
    val dups = candles ++ Seq(CandleIn(100, 11, 15, 9, 13, 1.0, 5),
      CandleIn(300, 20, 25, 19, 22, 2.0, 10))
    val results = Seq(1, 2, 5).map { p =>
      spark.createDataset(dups).repartition(p)
        .groupByKey(_ => 1).agg(CandleAggregator.toColumn)
        .collect().head._2
    }
    assert(results.distinct.size == 1, results.toString)
    assert(results.head.open == 10) // min price among t=100 opens
    assert(results.head.close == 22) // max price among t=300 closes
  }

  test("merge with zero buffer is the identity") {
    val b = candles.foldLeft(CandleAggregator.zero)(CandleAggregator.reduce)
    assert(CandleAggregator.merge(b, CandleAggregator.zero) == b ||
      CandleAggregator.finish(CandleAggregator.merge(b, CandleAggregator.zero)) ==
        CandleAggregator.finish(b))
    assert(CandleAggregator.finish(CandleAggregator.merge(CandleAggregator.zero, b)) ==
      CandleAggregator.finish(b))
  }
}
