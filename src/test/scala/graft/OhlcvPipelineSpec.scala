package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.sources.{Interchange, Ohlcv, Warehouse}

/** Reference-parity semantics (SURVEY §5.2 golden-value + property
  * tests): the float→int rounding trap, the positional CSV contract,
  * SERIAL id emulation, duplicate-append parity, and the end-to-end
  * two-stage pipeline on the FIXTURES.md §A.2 payload shape.
  */
class OhlcvPipelineSpec extends SparkSpec {

  private val payload =
    """[{"time_period_start": "2023-04-26T04:30:00.0000000Z",
      |  "time_period_end":   "2023-04-26T04:35:00.0000000Z",
      |  "time_open":         "2023-04-26T04:30:09.8120000Z",
      |  "time_close":        "2023-04-26T04:34:14.6860000Z",
      |  "price_open": 28370.4, "price_high": 28379.2,
      |  "price_low": 28360.0,  "price_close": 28360.8,
      |  "volume_traded": 0.61511822, "trades_count": 14}]""".stripMargin

  private def payloadAt(t: String, priceClose: Double): String =
    payload.replace("04:30:00", t).replace("28360.8", priceClose.toString)

  test("fromJson parses, rounds prices (not truncates), derives period_date") {
    val df = Ohlcv.fromJson(spark, Seq(payload))
    val r = df.collect().head
    assert(r.getAs[Int]("price_open") == 28370) // 28370.4 rounds down
    assert(r.getAs[Int]("price_high") == 28379) // 28379.2 → 28379
    assert(r.getAs[Int]("price_close") == 28361) // 28360.8 rounds UP — cast would give 28360
    assert(r.getAs[java.sql.Date]("period_date").toString == "2023-04-26")
    assert(r.getAs[java.sql.Timestamp]("time_period_start").toString == "2023-04-26 04:30:00.0")
  }

  test("splitJsonArray handles multi-candle arrays and braces in strings") {
    val two = """[{"a": "x{y"}, {"b": 2}]"""
    assert(Ohlcv.splitJsonArray(two) == Seq("""{"a": "x{y"}""", """{"b": 2}"""))
    assert(Ohlcv.splitJsonArray("""{"a": 1}""") == Seq("""{"a": 1}"""))
  }

  test("assignIds emulates SERIAL: contiguous from the high-water mark") {
    val df = Ohlcv.fromJson(spark, Seq(payload, payloadAt("04:35:00", 28361.2)))
    val ids = Ohlcv.assignIds(df, 5L).select("id").collect().map(_.getLong(0)).sorted
    assert(ids.sameElements(Array(6L, 7L)))
  }

  test("pipeline end-to-end: ingest tick, duplicate re-run parity, daily closeout") {
    val root = Files.createTempDirectory("graft-pipe").toString
    Pipeline.ingestTick(spark, root, "Bitcoin", Seq(payload))
    Pipeline.ingestTick(spark, root, "Bitcoin", Seq(payload)) // re-run duplicates (T3)
    val ingest = Warehouse.table(spark, s"$root/ingest/Bitcoin")
    assert(ingest.count() == 2, "append-only parity: re-runs must duplicate")
    assert(ingest.select("id").collect().map(_.getLong(0)).sorted.sameElements(Array(1L, 2L)))

    val stage = Pipeline.dailyCloseout(spark, root, "Bitcoin", "2023-04-26", "20230427T000000")
    assert(stage.endsWith("Bitcoin_price_data_20230427T000000"))
    val wh = Warehouse.table(spark, s"$root/warehouse/Bitcoin")
    assert(wh.count() == 2)
    // round-trip fidelity through the positional headerless CSV
    val a = ingest.orderBy("id").collect().toSeq
    val b = wh.orderBy("id").collect().toSeq
    assert(a == b)
  }

  test("interchange CSV is headerless with id first (positional contract)") {
    val root = Files.createTempDirectory("graft-csv").toString
    val df = Ohlcv.assignIds(Ohlcv.fromJson(spark, Seq(payload)), 0L)
    Interchange.writeCsv(df, s"$root/out")
    val line = spark.read.text(s"$root/out").collect().head.getString(0)
    assert(line.startsWith("1,2023-04-26"), s"id must lead: $line")
    assert(line.split(",", -1).length == Ohlcv.columns.length)
  }

  test("dedupCandles keeps the lowest id per period (opt-in T3 fix)") {
    val df = Ohlcv.assignIds(
      Ohlcv.fromJson(spark, Seq(payload, payload, payloadAt("04:40:00", 28361.2))), 0L)
    val deduped = Warehouse.dedupCandles(df)
    assert(deduped.count() == 2)
    assert(deduped.agg(min("id"), max("id")).collect().head.toSeq == Seq(1L, 3L))
  }

  test("reference query shapes return golden values on fixture rows") {
    // FIXTURES.md §A.1 rows: ids 1/2 duplicates, volumes/prices as in the
    // select_all screenshot.
    val rows = Seq(payload, payloadAt("04:45:00", 28315.0), payloadAt("05:40:00", 28408.0))
    val t = Ohlcv.assignIds(Ohlcv.fromJson(spark, rows), 0L)
    // A2 global max/min one-pass
    val mm = t.agg(max("price_high"), min("price_low")).collect().head
    assert(mm.getInt(0) == 28379 && mm.getInt(1) == 28360)
    // O1 top-1 by volume
    val top = t.orderBy(col("volume_traded").desc, col("id").asc).limit(1)
      .select("id").collect().head.getLong(0)
    assert(top == 1L)
  }
}
