package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.Catalog
import Exact.{sqlAvg, sqlSum}

/** The engine's SQL entry point (SURVEY §3.3: ad-hoc analytics lived in
  * the warehouse's SQL editor): every query here runs through
  * `spark.sql` over the temp-view catalog — parse → analyze → optimize
  * → execute entirely in Catalyst — and covers relational surface the
  * DataFrame modules don't: ROLLUP, set ops, PIVOT-shaped conditional
  * aggregation, scalar/IN subqueries, LAG/LEAD, string functions.
  *
  * Oracles are written per-engine (dialects differ slightly) but with
  * IDENTICAL arithmetic shapes — decimal-accumulated averages make the
  * scalar-subquery threshold deterministic on both engines.
  */
object SqlQueries {

  private def q(sql: String): (SparkSession, String) => DataFrame =
    (s, dir) => { Catalog.registerViews(s, dir); s.sql(sql) }

  private val avgPrice = s"${sqlAvg("o_totalprice")}"

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "sql_rollup" -> q(
      s"""SELECT l_returnflag, l_linestatus, ${sqlSum("l_quantity")} AS sum_qty,
         |COUNT(*) AS n FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)""".stripMargin),
    "sql_intersect" -> q(
      """SELECT c_nationkey AS nationkey FROM customer
        |INTERSECT SELECT s_nationkey AS nationkey FROM supplier""".stripMargin),
    "sql_except" -> q(
      """SELECT c_nationkey AS nationkey FROM customer
        |EXCEPT SELECT s_nationkey AS nationkey FROM supplier""".stripMargin),
    "sql_pivot_case" -> q(
      s"""SELECT l_linestatus,
         |${sqlSum("CASE WHEN l_returnflag = 'A' THEN l_quantity END")} AS qty_a,
         |${sqlSum("CASE WHEN l_returnflag = 'N' THEN l_quantity END")} AS qty_n,
         |${sqlSum("CASE WHEN l_returnflag = 'R' THEN l_quantity END")} AS qty_r
         |FROM lineitem GROUP BY l_linestatus""".stripMargin),
    "sql_scalar_subquery" -> q(
      s"""SELECT o_orderkey, o_totalprice FROM orders
         |WHERE o_totalprice > 2 * (SELECT $avgPrice FROM orders)""".stripMargin),
    "sql_in_subquery" -> q(
      """SELECT c_custkey, c_name FROM customer
        |WHERE c_nationkey IN (SELECT n_nationkey FROM nation WHERE n_regionkey = 0)""".stripMargin),
    "sql_lag_lead" -> q(
      """SELECT o_custkey, o_orderkey, o_totalprice,
        |LAG(o_totalprice) OVER w AS prev_price,
        |LEAD(o_totalprice) OVER w AS next_price
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)""".stripMargin),
    "sql_string_funcs" -> q(
      """SELECT c_custkey, UPPER(c_name) AS uname, LENGTH(c_name) AS name_len,
        |SUBSTR(c_name, 1, 8) AS prefix, REPLACE(c_name, '#', '-') AS dashed
        |FROM customer""".stripMargin),
    "sql_union_distinct" -> q(
      """SELECT c_nationkey AS nationkey FROM customer
        |UNION SELECT s_nationkey AS nationkey FROM supplier""".stripMargin),
    "sql_having" -> q(
      s"""SELECT o_custkey, COUNT(*) AS n_orders, ${sqlSum("o_totalprice")} AS total
         |FROM orders GROUP BY o_custkey HAVING COUNT(*) >= 3""".stripMargin),
    "sql_grouping_sets" -> q(
      s"""SELECT l_returnflag, l_linestatus, COUNT(*) AS n
         |FROM lineitem GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())""".stripMargin),
    "sql_cube" -> q(
      s"""SELECT l_returnflag, l_linestatus, ${sqlSum("l_quantity")} AS sum_qty
         |FROM lineitem GROUP BY CUBE(l_returnflag, l_linestatus)""".stripMargin),
    // exact interpolated percentiles (Spark `percentile` ≡ DuckDB
    // `quantile_cont`: sorted values, pos=(n-1)p, linear interpolation)
    "sql_percentile" -> q(
      """SELECT l_returnflag, round(percentile(l_quantity, 0.5), 6) AS median_qty,
        |round(percentile(l_quantity, 0.9), 6) AS p90_qty
        |FROM lineitem GROUP BY l_returnflag""".stripMargin),
  )

  // DuckDB spellings — same shapes, dialect-adjusted where needed.
  val oracle: Map[String, String] = Map(
    "sql_rollup" ->
      (s"SELECT l_returnflag, l_linestatus, ${sqlSum("l_quantity")} AS sum_qty, " +
       "COUNT(*) AS n FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)"),
    "sql_intersect" ->
      ("SELECT c_nationkey AS nationkey FROM customer " +
       "INTERSECT SELECT s_nationkey AS nationkey FROM supplier"),
    "sql_except" ->
      ("SELECT c_nationkey AS nationkey FROM customer " +
       "EXCEPT SELECT s_nationkey AS nationkey FROM supplier"),
    "sql_pivot_case" ->
      (s"SELECT l_linestatus, " +
       s"${sqlSum("CASE WHEN l_returnflag = 'A' THEN l_quantity END")} AS qty_a, " +
       s"${sqlSum("CASE WHEN l_returnflag = 'N' THEN l_quantity END")} AS qty_n, " +
       s"${sqlSum("CASE WHEN l_returnflag = 'R' THEN l_quantity END")} AS qty_r " +
       "FROM lineitem GROUP BY l_linestatus"),
    "sql_scalar_subquery" ->
      (s"SELECT o_orderkey, o_totalprice FROM orders " +
       s"WHERE o_totalprice > 2 * (SELECT $avgPrice FROM orders)"),
    "sql_in_subquery" ->
      ("SELECT c_custkey, c_name FROM customer " +
       "WHERE c_nationkey IN (SELECT n_nationkey FROM nation WHERE n_regionkey = 0)"),
    "sql_lag_lead" ->
      ("SELECT o_custkey, o_orderkey, o_totalprice, " +
       "LAG(o_totalprice) OVER w AS prev_price, " +
       "LEAD(o_totalprice) OVER w AS next_price " +
       "FROM orders WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)"),
    "sql_string_funcs" ->
      ("SELECT c_custkey, UPPER(c_name) AS uname, LENGTH(c_name) AS name_len, " +
       "SUBSTR(c_name, 1, 8) AS prefix, REPLACE(c_name, '#', '-') AS dashed FROM customer"),
    "sql_union_distinct" ->
      ("SELECT c_nationkey AS nationkey FROM customer " +
       "UNION SELECT s_nationkey AS nationkey FROM supplier"),
    "sql_having" ->
      (s"SELECT o_custkey, COUNT(*) AS n_orders, ${sqlSum("o_totalprice")} AS total " +
       "FROM orders GROUP BY o_custkey HAVING COUNT(*) >= 3"),
    "sql_grouping_sets" ->
      ("SELECT l_returnflag, l_linestatus, COUNT(*) AS n " +
       "FROM lineitem GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())"),
    "sql_cube" ->
      (s"SELECT l_returnflag, l_linestatus, ${sqlSum("l_quantity")} AS sum_qty " +
       "FROM lineitem GROUP BY CUBE(l_returnflag, l_linestatus)"),
    "sql_percentile" ->
      ("SELECT l_returnflag, round(quantile_cont(l_quantity, 0.5), 6) AS median_qty, " +
       "round(quantile_cont(l_quantity, 0.9), 6) AS p90_qty " +
       "FROM lineitem GROUP BY l_returnflag"),
  )
}
