package graft

import org.apache.spark.sql.functions._

import graft.sources.{Ohlcv, Warehouse}

/** Runnable documentation: the reference's entire user-visible workflow
  * (both DAGs + the four committed SQL queries + the dashboard
  * aggregations, SURVEY §3) against fixture candles — what a user of
  * `abrook7/ETL_Project` runs after switching to this engine.
  *
  * `sbt "runMain graft.Demo"`
  */
object Demo {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local()
    val root = java.nio.file.Files.createTempDirectory("graft-demo").toString

    // -- entry point A: three 5-minute ingest ticks (dags/airflow_dags.py:82-177)
    def payload(start: String, o: Double, h: Double, l: Double, c: Double,
                vol: Double, n: Int) = {
      val end = java.time.LocalDateTime.parse(start).plusMinutes(5)
        .format(java.time.format.DateTimeFormatter.ISO_LOCAL_DATE_TIME)
      s"""[{"time_period_start": "${start}.0000000Z",
         |"time_period_end": "${end}.0000000Z",
         |"time_open": "${start}.8120000Z", "time_close": "${start}.9990000Z",
         |"price_open": $o, "price_high": $h, "price_low": $l, "price_close": $c,
         |"volume_traded": $vol, "trades_count": $n}]""".stripMargin
    }
    Pipeline.ingestTick(spark, root, "Bitcoin",
      Seq(payload("2023-04-26T04:30:00", 28370.4, 28379.2, 28360.0, 28360.8, 0.615, 14)))
    Pipeline.ingestTick(spark, root, "Bitcoin",
      Seq(payload("2023-04-26T04:45:00", 28347.0, 28347.4, 28315.1, 28315.9, 9.087, 73)))
    Pipeline.ingestTick(spark, root, "Bitcoin",
      Seq(payload("2023-04-27T06:50:00", 29100.0, 29328.4, 28694.2, 29000.1, 150.798, 210)))

    // -- entry point B: close out the first day into the warehouse
    Pipeline.dailyCloseout(spark, root, "Bitcoin", "2023-04-26", "20230427T000000")

    val t = Warehouse.table(spark, s"$root/ingest/Bitcoin")
    println("== select-all (sql/Redshift_queries.sql:2-3)")
    t.show(10, truncate = false)

    println("== count on day (sql/Redshift_queries.sql:6-9)")
    t.filter(col("period_date") === lit("2023-04-26").cast("date"))
      .agg(count("id").as("cnt")).show()

    println("== highest-volume trading period (sql/Redshift_queries.sql:12-18)")
    t.select("time_period_start", "time_period_end", "volume_traded")
      .orderBy(col("volume_traded").desc).limit(1).show(truncate = false)

    println("== global max/min price (sql/Redshift_queries.sql:21-24)")
    t.agg(max("price_high"), min("price_low")).show()

    println("== dashboard daily tiles (QuickSight A3-A5)")
    t.groupBy("period_date")
      .agg(sum("volume_traded").as("volume"), min("price_low").as("low"),
        max("price_high").as("high"), sum("trades_count").as("trades"))
      .orderBy("period_date").show()

    spark.stop()
  }
}
