package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Parquet table loaders over a driver-provided scale-factor directory
  * (`/root/testdata/sf*`, see TESTDATA.md). All engine queries resolve
  * input through here so the physical layout (single parquet file per
  * table today; partitioned directories at cluster scale) is decided in
  * exactly one place.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  /** Spread a small single-file scan across all cores before heavy
    * per-row compute (minhash/simhash/unrolled dots): one parquet file =
    * one input split = one task, which serializes everything above it.
    * The round-robin shuffle of a few thousand rows is microseconds; at
    * cluster scale the source has thousands of splits and this repartition
    * is unnecessary (and would be dropped in favor of AQE coalescing).
    */
  def spread(spark: SparkSession, df: DataFrame): DataFrame =
    df.repartition(spark.sparkContext.defaultParallelism)

  def region(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "region")
  def nation(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "nation")
  def customer(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "customer")
  def supplier(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "supplier")
  def part(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "part")
  def orders(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "orders")
  def lineitem(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "lineitem")
  /** `events.ts` is parquet TIMESTAMP(NANOS) — unrepresentable in Spark's
    * micro-precision TimestampType. The session reads it as a nanos-epoch
    * long (`spark.sql.legacy.parquet.nanosAsLong=true`, set by
    * Sessions.builder) kept as exact `ts_ns`; a micro-truncated `ts`
    * timestamp is derived for calendar ops (`div 1000` = floor for the
    * post-1970 data; integer div — a double division would lose precision
    * above 2^53). Queries that must hash-match the DuckDB oracle emit
    * `ts_ns` (exact integers), never raw timestamps.
    */
  def events(spark: SparkSession, sfDir: String): DataFrame =
    deriveTs(load(spark, sfDir, "events"))

  /** The one place the nanos→micros contract lives (batch AND streaming
    * paths share it — see the events scaladoc above for the rationale).
    */
  def deriveTs(raw: DataFrame): DataFrame =
    raw.withColumnRenamed("ts", "ts_ns")
      .withColumn("ts", timestamp_micros(expr("ts_ns div 1000")))
  def documents(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "documents")
  def embeddings(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "embeddings")
}
