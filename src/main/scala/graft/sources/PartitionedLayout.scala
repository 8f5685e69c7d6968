package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Date-partitioned materialization of the events stream — the layout
  * the 100 TB deployment stores in the first place (SURVEY §4.2).
  *
  * The driver testdata ships events as one flat parquet file, so the
  * day-filter queries (P3/P4/A1/A5) evaluate `to_date(ts)` on every
  * row: a full scan per day queried. Partitioned by `period_date`,
  * the same filters become METADATA pruning — Spark lists only the
  * matching `period_date=...` directory and the scan reads 1/30th of
  * the data (PartitionFilters in the plan, verified by
  * PartitionedLayoutSpec). At 100 TB this is the difference between a
  * full-corpus scan and touching one day's files.
  */
object PartitionedLayout {

  /** One-time rewrite: events → `outDir` partitioned by period_date.
    * The nanos column stays exact; repartitioning by the partition
    * column keeps one output file per day (avoids the
    * many-small-files-per-task write pattern).
    */
  def materializeEvents(spark: SparkSession, sfDir: String, outDir: String): Unit =
    Tables.events(spark, sfDir)
      .withColumn("period_date", to_date(col("ts")))
      .drop("ts") // derived; ts_ns is the source of truth
      .repartition(col("period_date"))
      .write.mode("overwrite").partitionBy("period_date").parquet(outDir)

  def events(spark: SparkSession, outDir: String): DataFrame =
    spark.read.parquet(outDir)

  /** The day-filter query (P3) against the partitioned layout. */
  def eventsOn(spark: SparkSession, outDir: String, day: String): DataFrame =
    events(spark, outDir).filter(col("period_date") === lit(day).cast("date"))
}
