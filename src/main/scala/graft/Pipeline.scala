package graft

import org.apache.spark.sql.SparkSession

import graft.sources.{Interchange, Ohlcv, Warehouse}

/** The reference's two DAGs as one driver program (SURVEY §3):
  * Airflow's task graph dissolves into sequential Spark jobs; XCom
  * becomes a return value (T5), dependency edges become statement order
  * (T6).
  *
  * Layout per pipeline root:
  *   `<root>/ingest/<coin>`    — the Postgres analog (5-min appends)
  *   `<root>/stage/<csvName>`  — the S3 CSV stage (daily close-out)
  *   `<root>/warehouse/<coin>` — the Redshift analog (COPY target)
  */
object Pipeline {

  /** Entry point A (5-min ingest, airflow_dags.py:82-177): DDL →
    * fetch → transform → append. `payloads` stands in for the CoinAPI
    * response (the HTTP fetch is environment, not engine).
    */
  def ingestTick(spark: SparkSession, root: String, coin: String,
                 payloads: Seq[String]): Unit = {
    val tbl = s"$root/ingest/$coin"
    Warehouse.createIfNotExists(spark, tbl)
    val candles = Ohlcv.fromJson(spark, payloads)
    val withIds = Ohlcv.assignIds(candles, Warehouse.maxId(spark, tbl))
    Warehouse.append(withIds, tbl)
  }

  /** Entry point B (daily export + warehouse load,
    * airflow_dags.py:180-314): partition-pruned day filter → headerless
    * positional CSV stage → COPY-equivalent append. Returns the staged
    * CSV path (the XCom value, :79).
    */
  def dailyCloseout(spark: SparkSession, root: String, coin: String,
                    ds: String, tsNoDash: String): String = {
    val csvName = s"${coin}_price_data_$tsNoDash" // naming: airflow_dags.py:67
    val stage = s"$root/stage/$csvName"
    Interchange.writeCsv(Warehouse.dailyExport(spark, s"$root/ingest/$coin", ds), stage)
    val wh = s"$root/warehouse/$coin"
    Warehouse.createIfNotExists(spark, wh)
    Warehouse.append(Interchange.readCsv(spark, stage), wh)
    stage
  }
}
