package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Numeric helpers shared by every query that must hash-match the DuckDB
  * oracle.
  *
  * Floating-point SUM is order-dependent, and Spark's partial aggregation
  * order is nondeterministic across partitionings — at sf0.1 the
  * accumulated error is large enough to flip a `round(sum(x), 4)` in the
  * last digit. Summing through an exact DECIMAL accumulator is
  * associative, so the result is bit-stable on both engines regardless of
  * partitioning; the final cast back to DOUBLE keeps the output schema
  * engine-neutral. The oracle-side spelling is
  * `CAST(SUM(CAST(x AS DECIMAL(18,4))) AS DOUBLE)`.
  */
object Exact {
  /** Order-independent sum of a double expression (exact in DECIMAL(18,4)). */
  def dsum(c: Column): Column = sum(c.cast(DecimalType(18, 4))).cast("double")

  /** Order-independent mean: exact decimal sum divided by count, computed
    * in double (a single division is deterministic).
    */
  def davg(c: Column): Column =
    (sum(c.cast(DecimalType(18, 4))).cast("double") / count(c)).cast("double")

  /** Oracle-SQL spelling of [[dsum]]. */
  def sqlSum(expr: String): String =
    s"CAST(SUM(CAST($expr AS DECIMAL(18,4))) AS DOUBLE)"

  /** Oracle-SQL spelling of [[davg]]. */
  def sqlAvg(expr: String): String =
    s"CAST(CAST(SUM(CAST($expr AS DECIMAL(18,4))) AS DOUBLE) / COUNT($expr) AS DOUBLE)"
}
