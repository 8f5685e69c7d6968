package graft

import java.sql.DriverManager

import org.apache.spark.sql.functions._

import graft.sources.Jdbc

/** The round-2→4 carried "JDBC reality check": drive `format("jdbc")`
  * against EMBEDDED Derby (shipped in Spark's jar dir), proving the S2
  * day-filter is pushed into the database and the K1 append really
  * lands rows — not just the parquet analogs.
  */
class JdbcSpec extends SparkSpec {

  private val Driver = "org.apache.derby.jdbc.EmbeddedDriver"
  private val Url = "jdbc:derby:memory:graftdb;create=true"

  private lazy val setup: Unit = {
    Class.forName(Driver)
    val c = DriverManager.getConnection(Url)
    val st = c.createStatement()
    st.execute(
      """CREATE TABLE candles (
        |  id BIGINT NOT NULL, period_date DATE, price_close INT,
        |  volume_traded DOUBLE)""".stripMargin)
    val ins = c.prepareStatement("INSERT INTO candles VALUES (?, ?, ?, ?)")
    (1 to 20).foreach { i =>
      ins.setLong(1, i.toLong)
      ins.setDate(2, java.sql.Date.valueOf(if (i <= 12) "2023-04-26" else "2023-04-27"))
      ins.setInt(3, 100 + i)
      ins.setDouble(4, i * 1.5)
      ins.executeUpdate()
    }
    st.close(); ins.close(); c.close()
  }

  test("full scan reads every row with the declared schema") {
    setup
    val df = Jdbc.read(spark, Url, "candles", Driver)
    assert(df.count() === 20)
    assert(df.columns.map(_.toLowerCase).toSeq ==
      Seq("id", "period_date", "price_close", "volume_traded"))
  }

  test("S2 day filter is pushed into the database") {
    setup
    val day = Jdbc.daily(spark, Url, "candles", Driver, "2023-04-26")
    val plan = day.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("PERIOD_DATE"),
      s"date filter must reach the JDBC scan:\n$plan")
    assert(day.count() === 12)
  }

  test("partitioned read fans the scan out over range predicates") {
    setup
    val df = Jdbc.readPartitioned(spark, Url, "candles", Driver,
      partitionColumn = "id", lower = 1L, upper = 21L, numPartitions = 4)
    assert(df.rdd.getNumPartitions === 4, "one connection per range slice")
    assert(df.count() === 20, "range slices must cover all rows exactly once")
  }

  test("K1 append creates the sink table and lands rows; re-append appends") {
    setup
    val out = Jdbc.read(spark, Url, "candles", Driver)
      .filter(col("id") <= 3).select(col("id"), col("price_close"))
    Jdbc.append(out, Url, "candles_out", Driver)
    assert(Jdbc.read(spark, Url, "candles_out", Driver).count() === 3)
    // reference T3 semantics: plain append is duplicate-tolerant
    Jdbc.append(out, Url, "candles_out", Driver)
    assert(Jdbc.read(spark, Url, "candles_out", Driver).count() === 6)
  }
}
