package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Structured-Streaming ingestion of the `events` table from a file
  * source — "streams are incremental batch": the SAME daily aggregate
  * the batch engine computes (CoreQueries.countByDay), expressed over
  * `readStream`, must produce identical results once the stream drains
  * (EventStreamSpec proves it with Trigger.AvailableNow).
  *
  * At deployment scale this is the landing-zone pattern: parquet files
  * arrive in a date-partitioned directory, `maxFilesPerTrigger` bounds
  * each micro-batch, the watermark bounds state, and the sink appends
  * closed windows — no reprocessing of the growing corpus.
  */
object EventStream {

  /** Raw schema of the events parquet (ts read as nanos long — file
    * sources require an explicit schema, same nanos handling as
    * Tables.events).
    */
  val schema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", LongType), // TIMESTAMP(NANOS) via nanosAsLong
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  def read(spark: SparkSession, dir: String, maxFilesPerTrigger: Int = 1): DataFrame =
    graft.Tables.deriveTs(
      spark.readStream
        .schema(schema)
        .option("maxFilesPerTrigger", maxFilesPerTrigger)
        .parquet(dir))

  /** The A4 daily count as a watermarked streaming aggregate. */
  def countByDay(events: DataFrame, delay: String = "1 hour"): DataFrame =
    events
      .withWatermark("ts", delay)
      .groupBy(window(col("ts"), "1 day").as("day"))
      .agg(count("*").as("n_events"))
      .select(to_date(col("day.start")).as("period_date"), col("n_events"))
}
