package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import Exact._

/** Reference-parity operators from SURVEY.md §2, realized on the driver
  * testdata (`events` is the OHLCV analog: a timestamped fact stream with
  * a measure; see FIXTURES.md §B.1).
  *
  * Every query here is deterministic (pinned date literals instead of the
  * reference's `current_date - 1` — SURVEY §7.5.4 — and explicit
  * tie-breaking sort keys under every LIMIT) and carries a DuckDB oracle
  * in [[oracle]] with identical output column names.
  *
  * Scale notes (100 TB design stance):
  *   - filters/projections are plain Catalyst expressions → pushed into
  *     the parquet scan (PushedFilters / ReadSchema), partition-prunable
  *     once the table is laid out `partitionBy(period_date)`;
  *   - the aggregations are hash-aggregates with map-side partial
  *     aggregation — one shuffle on the group key, no sort;
  *   - top-k uses orderBy+limit which Spark plans as
  *     TakeOrderedAndProject: per-partition heaps + driver merge of k
  *     rows, never a global sort.
  */
object CoreQueries {

  /** Pinned "as-of" day inside the events range (2024-01-01..2024-01-30,
    * all scale factors). Stands in for the reference's `current_date - 1`
    * (sql/Redshift_queries.sql:9).
    */
  val AsOfDay = "2024-01-15"

  // ---- P1/S4: project-all full scan (sql/Redshift_queries.sql:2-3) ----
  // ts is emitted as exact epoch MICROS: Spark's TimestampType is micros,
  // and DuckDB's parquet reader may itself narrow TIMESTAMP(NANOS) to
  // micros — epoch_us agrees on both engines whether or not the oracle
  // kept nanosecond precision.
  def selectAll(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .select(col("event_id"), expr("ts_ns div 1000").as("ts_us"),
        col("user_id"), col("event_type"), col("value"), col("props"))

  // ---- P2: column projection (sql/Redshift_queries.sql:12-15) ----
  def projection(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir).select("l_orderkey", "l_linenumber", "l_quantity")

  // ---- P3: equality filter on a date literal (dags/airflow_dags.py:61-65) ----
  def filterDay(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .filter(to_date(col("ts")) === lit(AsOfDay).cast("date"))
      .select("event_id", "event_type", "value")

  // ---- P4/F3: filter with date arithmetic (current_date - 1 analog) ----
  def filterYesterday(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .filter(to_date(col("ts")) === date_sub(lit(AsOfDay).cast("date"), 1))
      .select("event_id", "event_type", "value")

  // ---- P5/F2: derived date column (dags/airflow_dags.py:49) ----
  def derivedDate(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .select(col("event_id"), to_date(col("ts")).as("period_date"))

  // ---- A1: global COUNT with day filter (sql/Redshift_queries.sql:6-9) ----
  def countDay(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .filter(to_date(col("ts")) === lit(AsOfDay).cast("date"))
      .agg(count("*").as("cnt"))

  // ---- A2: global MAX + MIN in one pass (sql/Redshift_queries.sql:21-24) ----
  def maxMin(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .agg(max("value").as("max_value"), min("value").as("min_value"))

  // ---- A3: grouped daily SUM (QuickSight "Volume Traded" bar chart) ----
  def sumByDay(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .groupBy(to_date(col("ts")).as("period_date"))
      .agg(dsum(col("value")).as("sum_value"))

  // ---- A4: grouped daily COUNT (QuickSight "Total Trades" bar chart) ----
  def countByDay(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .groupBy(to_date(col("ts")).as("period_date"))
      .agg(count("*").as("n_events"))

  // ---- A5: filtered scalar KPIs (QuickSight "yesterday" tiles) ----
  def kpiDay(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .filter(to_date(col("ts")) === lit(AsOfDay).cast("date"))
      .agg(
        dsum(col("value")).as("total_value"),
        min(col("value")).as("min_value"),
        max(col("value")).as("max_value"))

  // ---- A6: 5-minute time-series resample (QuickSight price line chart) ----
  // Bucket start is emitted as epoch seconds (BIGINT) so the oracle-side
  // spelling is engine-neutral; Spark's window() start would be a
  // timestamp whose textual form risks TZ-formatting drift.
  def bucket5Min(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .filter(to_date(col("ts")) === lit(AsOfDay).cast("date"))
      .groupBy((floor(unix_timestamp(col("ts")) / 300) * 300).cast("long").as("bucket_start"))
      .agg(davg(col("value")).as("avg_value"), count("*").as("n"))

  // ---- O1: top-1 by measure (sql/Redshift_queries.sql:12-18) ----
  def top1ByValue(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .orderBy(col("value").desc, col("event_id").asc)
      .limit(1)
      .select("event_id", "event_type", "value")

  // ---- O2: row cap (QuickSight editor "Limit 100") ----
  def top100(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .orderBy(col("event_id").asc)
      .limit(100)
      .select("event_id", "event_type", "value")

  // ---- F4: float→int narrowing that ROUNDS, not truncates (SURVEY §1.4) ----
  def roundCast(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .select(col("event_id"), round(col("value")).cast("int").as("value_int"))

  // ---- F3: date arithmetic as a projection ----
  def dateArith(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .select(to_date(col("ts")).as("d"))
      .distinct()
      .select(col("d"), date_sub(col("d"), 1).as("d_minus_1"))

  // ---- JSON extraction from the events.props payload (S1 analog:
  //      the reference ingests a JSON API body; here the JSON column) ----
  def jsonExtract(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .select(
        col("event_id"),
        get_json_object(col("props"), "$.k").cast("int").as("k"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "core_select_all" -> (selectAll _),
    "core_projection" -> (projection _),
    "core_filter_day" -> (filterDay _),
    "core_filter_yesterday" -> (filterYesterday _),
    "core_derived_date" -> (derivedDate _),
    "core_count_day" -> (countDay _),
    "core_max_min" -> (maxMin _),
    "core_sum_by_day" -> (sumByDay _),
    "core_count_by_day" -> (countByDay _),
    "core_kpi_day" -> (kpiDay _),
    "core_bucket_5min" -> (bucket5Min _),
    "core_top1_by_value" -> (top1ByValue _),
    "core_top100" -> (top100 _),
    "core_round_cast" -> (roundCast _),
    "core_date_arith" -> (dateArith _),
    "core_json_extract" -> (jsonExtract _),
  )

  val oracle: Map[String, String] = Map(
    "core_select_all" ->
      "SELECT event_id, epoch_us(ts) AS ts_us, user_id, event_type, value, props FROM events",
    "core_projection" ->
      "SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem",
    "core_filter_day" ->
      s"SELECT event_id, event_type, value FROM events WHERE CAST(ts AS DATE) = DATE '$AsOfDay'",
    "core_filter_yesterday" ->
      s"SELECT event_id, event_type, value FROM events WHERE CAST(ts AS DATE) = DATE '$AsOfDay' - 1",
    "core_derived_date" ->
      "SELECT event_id, CAST(ts AS DATE) AS period_date FROM events",
    "core_count_day" ->
      s"SELECT COUNT(*) AS cnt FROM events WHERE CAST(ts AS DATE) = DATE '$AsOfDay'",
    "core_max_min" ->
      "SELECT MAX(value) AS max_value, MIN(value) AS min_value FROM events",
    "core_sum_by_day" ->
      s"SELECT CAST(ts AS DATE) AS period_date, ${sqlSum("value")} AS sum_value FROM events GROUP BY 1",
    "core_count_by_day" ->
      "SELECT CAST(ts AS DATE) AS period_date, COUNT(*) AS n_events FROM events GROUP BY 1",
    "core_kpi_day" ->
      (s"SELECT ${sqlSum("value")} AS total_value, MIN(value) AS min_value, MAX(value) AS max_value " +
       s"FROM events WHERE CAST(ts AS DATE) = DATE '$AsOfDay'"),
    "core_bucket_5min" ->
      (s"SELECT CAST(FLOOR(EPOCH(ts)/300)*300 AS BIGINT) AS bucket_start, " +
       s"${sqlAvg("value")} AS avg_value, COUNT(*) AS n " +
       s"FROM events WHERE CAST(ts AS DATE) = DATE '$AsOfDay' GROUP BY 1"),
    "core_top1_by_value" ->
      "SELECT event_id, event_type, value FROM events ORDER BY value DESC, event_id LIMIT 1",
    "core_top100" ->
      "SELECT event_id, event_type, value FROM events ORDER BY event_id LIMIT 100",
    "core_round_cast" ->
      "SELECT event_id, CAST(ROUND(value, 0) AS INTEGER) AS value_int FROM events",
    "core_date_arith" ->
      "SELECT d, d - 1 AS d_minus_1 FROM (SELECT DISTINCT CAST(ts AS DATE) AS d FROM events)",
    "core_json_extract" ->
      "SELECT event_id, CAST(props->>'$.k' AS INTEGER) AS k FROM events",
  )
}
