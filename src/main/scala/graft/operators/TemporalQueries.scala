package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Temporal join/segmentation operators over the `events` stream — the
  * shapes Spark has no single built-in operator for (as-of join, range
  * join, gap sessionization), each COMPOSED from equi-joins and windows
  * so the planner never falls back to a nested-loop join.
  *
  * Timestamps flow as exact epoch MICROS (`ts_ns div 1000`, mirroring
  * `epoch_us(ts)` in DuckDB — see Tables.events scaladoc), so every
  * comparison and gap subtraction is integer arithmetic, identical on
  * both engines.
  *
  * 100 TB design:
  *   - the AS-OF join is one window pass over the union of both sides,
  *     partitioned by the join key: shuffle each side ONCE by
  *     (user_id), never pair rows across keys. The classic alternative
  *     — inequality theta-join — is a nested loop over every
  *     (left, right) pair; the union-window form is linear in rows and
  *     is how as-of joins are done at warehouse scale;
  *   - the RANGE join buckets time into fixed intervals and probes each
  *     side's bucket and its successor as a plain equi-join, refining
  *     the exact range bound inside the join condition — candidate
  *     pairs are bounded by bucket co-occupancy, not |L|×|R|;
  *   - sessionization is lag + running sum over (user, time) — one
  *     shuffle on the session key; state per row is O(1).
  */
object TemporalQueries {

  /** Session gap and range-join window: 30 min / 5 min in micros. */
  val SessionGapUs: Long = 30L * 60 * 1000000
  val RangeWindowUs: Long = 5L * 60 * 1000000

  private def ev(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir).select(col("event_id"), col("user_id"),
      col("event_type"), expr("ts_ns div 1000").as("ts_us"))

  // ---- AS-OF join: each error pairs with the user's latest click
  //      at-or-before it ----
  // Union both sides, order by (ts, side, id) within the user — clicks
  // sort before errors at equal timestamps, so "at-or-before" includes
  // ties and the running last_value(click, ignoreNulls) at each error
  // row IS the as-of match. Fully deterministic: event_id breaks any
  // remaining order tie.
  def asofJoin(s: SparkSession, dir: String): DataFrame = {
    val both = ev(s, dir)
      .filter(col("event_type").isin("click", "error"))
      .withColumn("is_err", when(col("event_type") === "error", 1).otherwise(0))
      .withColumn("click_id", when(col("event_type") === "click", col("event_id")))
      .withColumn("click_ts", when(col("event_type") === "click", col("ts_us")))
    val w = Window.partitionBy("user_id")
      .orderBy(col("ts_us"), col("is_err"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    both
      .withColumn("last_click_id", last(col("click_id"), ignoreNulls = true).over(w))
      .withColumn("last_click_ts", last(col("click_ts"), ignoreNulls = true).over(w))
      .filter(col("event_type") === "error")
      .select(col("event_id").as("err_id"), col("user_id"),
        col("ts_us").as("err_ts_us"), col("last_click_id"), col("last_click_ts"))
  }

  // ---- Gap sessionization: new session at ≥30 min idle ----
  // Boundary convention: gap-or-more idle starts a new session (>=),
  // matching Structured Streaming's `session_window` (which merges only
  // while ts < prev + gap) — so the EventStream.sessionize twin is
  // row-level identical even for an event landing exactly on the gap
  // boundary (cron-aligned pings do exactly that).
  def sessionize(s: SparkSession, dir: String): DataFrame = {
    val wOrd = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    val wRun = wOrd.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ev(s, dir)
      .withColumn("prev_ts", lag("ts_us", 1).over(wOrd))
      .withColumn("new_sess",
        when(col("prev_ts").isNull ||
          col("ts_us") - col("prev_ts") >= SessionGapUs, 1).otherwise(0))
      .withColumn("session_idx", sum("new_sess").over(wRun))
      .groupBy("user_id", "session_idx")
      .agg(count("*").as("n_events"),
        min("ts_us").as("session_start_us"),
        max("ts_us").as("session_end_us"))
  }

  // ---- Range join: clicks (any user) in the 5 min after each error ----
  // Bucketed: a click lives in ONE floor(ts/window) bucket; an error's
  // 5-minute lookahead spans at most its own bucket and the next, so
  // probing (b, b+1) as an equi-join covers every candidate exactly
  // once. The exact range bound rides in the join condition (left
  // outer, so zero-click errors keep their row through the count).
  def rangeJoinCounts(s: SparkSession, dir: String): DataFrame = {
    val base = ev(s, dir)
    val bkt = (c: org.apache.spark.sql.Column) => floor(c / RangeWindowUs)
    val errors = base.filter(col("event_type") === "error")
      .select(col("event_id").as("err_id"), col("ts_us").as("err_ts_us"))
      .withColumn("bkt", explode(array(bkt(col("err_ts_us")), bkt(col("err_ts_us")) + 1)))
    val clicks = base.filter(col("event_type") === "click")
      .select(col("ts_us").as("click_ts_us"))
      .withColumn("bkt", bkt(col("click_ts_us")))
    errors.join(clicks,
        errors("bkt") === clicks("bkt") &&
          col("click_ts_us") > col("err_ts_us") &&
          col("click_ts_us") <= col("err_ts_us") + RangeWindowUs,
        "left_outer")
      .groupBy("err_id", "err_ts_us")
      .agg(count(col("click_ts_us")).as("n_clicks_5min"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "rel_asof_join" -> (asofJoin _),
    "rel_sessionize" -> (sessionize _),
    "rel_range_join" -> (rangeJoinCounts _),
  )

  private val oEv =
    "SELECT event_id, user_id, event_type, epoch_us(ts) AS ts_us FROM events"

  val oracle: Map[String, String] = Map(
    "rel_asof_join" ->
      (s"""WITH ev AS (SELECT * FROM ($oEv) WHERE event_type IN ('click', 'error')),
          |t AS (SELECT *, CASE WHEN event_type = 'error' THEN 1 ELSE 0 END AS is_err,
          |  CASE WHEN event_type = 'click' THEN event_id END AS click_id,
          |  CASE WHEN event_type = 'click' THEN ts_us END AS click_ts FROM ev),
          |w AS (SELECT *,
          |  last_value(click_id IGNORE NULLS) OVER (PARTITION BY user_id ORDER BY ts_us, is_err, event_id
          |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS last_click_id,
          |  last_value(click_ts IGNORE NULLS) OVER (PARTITION BY user_id ORDER BY ts_us, is_err, event_id
          |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS last_click_ts FROM t)
          |SELECT event_id AS err_id, user_id, ts_us AS err_ts_us, last_click_id, last_click_ts
          |FROM w WHERE event_type = 'error'""".stripMargin.replace("\n", " ")),
    "rel_sessionize" ->
      (s"""WITH ev AS ($oEv),
          |l AS (SELECT user_id, event_id, ts_us,
          |  lag(ts_us) OVER (PARTITION BY user_id ORDER BY ts_us, event_id) AS prev_ts FROM ev),
          |m AS (SELECT *, CASE WHEN prev_ts IS NULL OR ts_us - prev_ts >= $SessionGapUs THEN 1 ELSE 0 END AS new_sess FROM l),
          |x AS (SELECT *, SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
          |  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_idx FROM m)
          |SELECT user_id, CAST(session_idx AS BIGINT) AS session_idx, COUNT(*) AS n_events,
          |  MIN(ts_us) AS session_start_us, MAX(ts_us) AS session_end_us
          |FROM x GROUP BY 1, 2""".stripMargin.replace("\n", " ")),
    "rel_range_join" ->
      (s"""WITH ev AS ($oEv),
          |e AS (SELECT event_id AS err_id, ts_us AS err_ts_us FROM ev WHERE event_type = 'error'),
          |c AS (SELECT ts_us AS click_ts_us FROM ev WHERE event_type = 'click')
          |SELECT err_id, err_ts_us, COUNT(c.click_ts_us) AS n_clicks_5min
          |FROM e LEFT JOIN c ON c.click_ts_us > e.err_ts_us AND c.click_ts_us <= e.err_ts_us + $RangeWindowUs
          |GROUP BY 1, 2""".stripMargin.replace("\n", " ")),
  )
}
