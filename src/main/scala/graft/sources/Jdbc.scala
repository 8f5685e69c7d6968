package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Real JDBC source/sink — SURVEY §2.1 S2 (the reference's Postgres
  * day-filtered read, airflow_dags.py:52-66) and §2.2 K1 (the
  * `to_sql(if_exists='append')` sink, :59) on `format("jdbc")` instead
  * of the parquet-native analogs in [[Warehouse]]. JdbcSpec drives the
  * whole surface against an EMBEDDED Derby database (the one JDBC
  * engine shipped with Spark's jars — this sandbox resolves nothing
  * else), proving filter pushdown and append for real.
  *
  * Scale notes:
  *   - [[daily]]'s WHERE reaches the database (`PushedFilters` on the
  *     JDBC scan → the filter runs remotely, only the day's rows cross
  *     the wire) — the same property the reference gets by inlining the
  *     date into its SQL;
  *   - a plain JDBC read is ONE partition = one connection = serial.
  *     [[readPartitioned]] splits the scan into `numPartitions` range
  *     predicates on a numeric column — the only way a 1000-executor
  *     cluster drains a big table without a single-connection
  *     bottleneck. Size partitions so each query's range hits the
  *     table's index.
  */
object Jdbc {

  /** Base reader; `driver` names the JDBC driver class explicitly (the
    * executor-side DriverManager can't always service-load it).
    */
  def read(spark: SparkSession, url: String, table: String,
           driver: String): DataFrame =
    spark.read.format("jdbc")
      .option("url", url).option("dbtable", table)
      .option("driver", driver)
      .load()

  /** S2: the daily close-out read — the date equality is pushed into
    * the database (JdbcSpec asserts `PushedFilters` on the plan).
    */
  def daily(spark: SparkSession, url: String, table: String,
            driver: String, ds: String): DataFrame =
    read(spark, url, table, driver)
      .filter(col("period_date") === lit(ds).cast("date"))

  /** Parallel range-partitioned scan over a numeric key. */
  def readPartitioned(spark: SparkSession, url: String, table: String,
                      driver: String, partitionColumn: String,
                      lower: Long, upper: Long, numPartitions: Int): DataFrame =
    spark.read.format("jdbc")
      .option("url", url).option("dbtable", table)
      .option("driver", driver)
      .option("partitionColumn", partitionColumn)
      .option("lowerBound", lower).option("upperBound", upper)
      .option("numPartitions", numPartitions)
      .load()

  /** K1: append rows into a warehouse table (created on first write —
    * the reference's `if_exists='append'`).
    */
  def append(df: DataFrame, url: String, table: String, driver: String): Unit =
    df.write.format("jdbc").mode("append")
      .option("url", url).option("dbtable", table)
      .option("driver", driver)
      .save()
}
