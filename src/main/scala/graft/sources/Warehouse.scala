package graft.sources

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Table layer replacing the reference's Postgres + Redshift pair with
  * one parquet layout (SURVEY §7.1): tables are directories partitioned
  * by `period_date`, so the daily close-out filter (P3/T2) and the
  * `current_date - 1` analytics (P4) become metadata-only partition
  * pruning — the Spark equivalent of the reference pushing its WHERE
  * into Postgres (airflow_dags.py:61-66).
  *
  * Append semantics mirror the reference exactly: no dedup, duplicate
  * rows on re-run are EXPECTED (T3; screenshot evidence ids 1/2, 9/10) —
  * [[dedupCandles]] is the opt-in fix, not the default.
  */
object Warehouse {

  /** D1/D2: CREATE TABLE IF NOT EXISTS — idempotent, run before loads. */
  def createIfNotExists(spark: SparkSession, path: String): Unit = {
    val dir = Paths.get(path)
    if (!Files.exists(dir)) {
      spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], Ohlcv.tableSchema)
        .write.partitionBy("period_date").parquet(path)
    }
  }

  /** K1/K4: append into the partitioned table (JDBC append ≅ COPY). */
  def append(df: DataFrame, path: String): Unit =
    df.select(Ohlcv.columns.map(df.col): _*)
      .write.mode("append").partitionBy("period_date").parquet(path)

  /** K1/K4 streaming form: idempotent per-batch append for
    * `foreachBatch`. Each micro-batch lands in its own
    * `__batch_id=<id>` partition (plus the daily partition) with
    * DYNAMIC partition overwrite, so a REDELIVERED batch — failure
    * replay, checkpoint restart — REPLACES its own previous output
    * instead of appending duplicates: exactly-once table contents over
    * at-least-once delivery, the parquet analog of the reference's
    * transactional COPY (airflow_dags.py:279-310). The plain [[append]]
    * stays duplicate-tolerant (T3) — idempotence here is opt-in per
    * sink, not a change to batch semantics.
    */
  def idempotentAppend(df: DataFrame, path: String, batchId: Long): Unit =
    df.select(Ohlcv.columns.map(df.col): _*)
      .withColumn("__batch_id", lit(batchId))
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("__batch_id", "period_date")
      .parquet(path)

  /** Streaming-table schema: the declared columns plus the batch
    * bookkeeping partition column. Reads go through an EXPLICIT schema —
    * inference over a directory that exists but holds no data files yet
    * (an empty first micro-batch writes only _SUCCESS) throws, killing
    * the stream; with the schema such a read is just an empty frame.
    */
  private val streamSchema: org.apache.spark.sql.types.StructType =
    Ohlcv.tableSchema.add("__batch_id", org.apache.spark.sql.types.LongType)

  /** The streaming table: same rows as [[table]], batch bookkeeping
    * column dropped, declared column order restored.
    */
  def streamTable(spark: SparkSession, path: String): DataFrame = {
    val df = spark.read.schema(streamSchema).parquet(path).drop("__batch_id")
    df.select(Ohlcv.columns.map(df.col): _*)
  }

  /** SERIAL high-water mark over batches BEFORE `belowBatch` only:
    * excluding the current batch makes id assignment DETERMINISTIC
    * under redelivery (a replayed batch sees the same mark its first
    * delivery saw, so it re-produces identical rows for the partition
    * overwrite to replace).
    *
    * Cost note: this scans the earlier batches' id column — the sink
    * ([[graft.streaming.CandleStream.warehouseSink]]) therefore calls it
    * only on the FIRST batch after a (re)start and tracks the mark
    * incrementally afterwards, so steady state is O(batch), not
    * O(table). Existence check is java.nio = local-filesystem analog,
    * consistent with this module's parquet-directory warehouse model;
    * a DFS deployment swaps in the Hadoop FileSystem API here.
    */
  def streamMaxId(spark: SparkSession, path: String, belowBatch: Long): Long =
    if (!Files.exists(Paths.get(path))) 0L
    else spark.read.schema(streamSchema).parquet(path)
      // NULL __batch_id = rows written by the BATCH path (no batch
      // partition dirs): a pre-existing warehouse the stream is pointed
      // at. They predate every batch, so they count toward the mark —
      // otherwise the first streamed batch would restart ids at 1 and
      // collide with them. Stable under replay: batch-path rows are
      // untouched by redelivery overwrites.
      .filter(col("__batch_id").isNull || col("__batch_id") < belowBatch)
      .agg(coalesce(max("id"), lit(0L))).collect().head.getLong(0)

  def table(spark: SparkSession, path: String): DataFrame = {
    val df = spark.read.schema(Ohlcv.tableSchema).parquet(path)
    // partitionBy moves period_date last in the physical layout; restore
    // the declared column order (the positional CSV contract needs it).
    df.select(Ohlcv.columns.map(df.col): _*)
  }

  /** Current max id, the SERIAL high-water mark for [[Ohlcv.assignIds]].
    * An inherently serial point (SURVEY §7.5.1) — fine at reference
    * cadence, replaced by natural keys at scale.
    */
  def maxId(spark: SparkSession, path: String): Long = {
    val r = table(spark, path).agg(coalesce(max("id"), lit(0L))).collect()
    r.head.getLong(0)
  }

  /** T2: the daily close-out — `SELECT * WHERE period_date = ds`
    * (airflow_dags.py:61-65) as a partition-pruned scan.
    */
  def dailyExport(spark: SparkSession, path: String, ds: String): DataFrame =
    table(spark, path).filter(col("period_date") === lit(ds).cast("date"))

  /** T3 fix (extension, opt-in): one candle per (time_period_start),
    * keeping the lowest id — deterministic, unlike dropDuplicates whose
    * survivor is partition-order dependent.
    */
  def dedupCandles(df: DataFrame): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("time_period_start").orderBy("id")
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__rn")
  }
}
