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

  /** The streamed batches' section of a warehouse directory. The name
    * is underscore-prefixed ON PURPOSE: Spark's file listing hides
    * `_`-prefixed children (the `_spark_metadata` / `_SUCCESS`
    * convention), so the batch layout at the table root
    * (`period_date=…`) and the stream layout in here
    * (`__batch_id=…/period_date=…`) never meet in one partition
    * discovery — mixing them in a single directory tree would fail
    * every read with a conflicting-directory-structures error. A
    * warehouse can therefore take batch appends and streamed batches
    * in any order; [[table]] stitches the two sections back together.
    */
  private def streamSection(path: String): String = s"$path/_stream"

  /** K1/K4 streaming form: idempotent per-batch append for
    * `foreachBatch`. Each micro-batch lands in its own
    * `__batch_id=<id>` partition (plus the daily partition) under
    * [[streamSection]] with DYNAMIC partition overwrite, so a
    * REDELIVERED batch — failure replay, checkpoint restart — REPLACES
    * its own previous output instead of appending duplicates:
    * exactly-once table contents over at-least-once delivery, the
    * parquet analog of the reference's transactional COPY
    * (airflow_dags.py:279-310). The plain [[append]] stays
    * duplicate-tolerant (T3) — idempotence here is opt-in per sink,
    * not a change to batch semantics.
    */
  def idempotentAppend(df: DataFrame, path: String, batchId: Long): Unit =
    df.select(Ohlcv.columns.map(df.col): _*)
      .withColumn("__batch_id", lit(batchId))
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("__batch_id", "period_date")
      .parquet(streamSection(path))

  /** Streaming-table schema: the declared columns plus the batch
    * bookkeeping partition column. Reads go through an EXPLICIT schema —
    * inference over a directory that exists but holds no data files yet
    * (an empty first micro-batch writes only _SUCCESS) throws, killing
    * the stream; with the schema such a read is just an empty frame.
    */
  private val streamSchema: org.apache.spark.sql.types.StructType =
    Ohlcv.tableSchema.add("__batch_id", org.apache.spark.sql.types.LongType)

  /** Rows the BATCH path wrote: the table root, whose `_stream` child
    * is hidden from the listing. Explicit schema — a root that exists
    * but holds no visible data files yet (stream-only warehouse) must
    * read as empty, not fail inference.
    */
  private def batchRows(spark: SparkSession, path: String): DataFrame =
    spark.read.schema(Ohlcv.tableSchema).parquet(path)

  /** Rows the STREAM path wrote, bookkeeping `__batch_id` included;
    * empty frame when nothing was ever streamed.
    */
  private def streamRows(spark: SparkSession, path: String): DataFrame = {
    val dir = streamSection(path)
    if (Files.exists(Paths.get(dir)))
      spark.read.schema(streamSchema).parquet(dir)
    else
      spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], streamSchema)
  }

  /** The streaming table: same full view as [[table]] (both sections),
    * kept as the sink-side entry point.
    */
  def streamTable(spark: SparkSession, path: String): DataFrame =
    table(spark, path)

  /** SERIAL high-water mark over batches BEFORE `belowBatch` only:
    * excluding the current batch makes id assignment DETERMINISTIC
    * under redelivery (a replayed batch sees the same mark its first
    * delivery saw, so it re-produces identical rows for the partition
    * overwrite to replace). Batch-path rows — a pre-existing warehouse
    * the stream was pointed at — predate every batch, so they always
    * count toward the mark; otherwise the first streamed batch would
    * restart ids at 1 and collide with them. Stable under replay:
    * batch-path rows are untouched by redelivery overwrites.
    *
    * Cost note: this scans the earlier rows' id column — the sink
    * ([[graft.streaming.CandleStream.warehouseSink]]) therefore calls it
    * only on the FIRST batch after a (re)start and tracks the mark
    * incrementally afterwards, so steady state is O(batch), not
    * O(table). Existence check is java.nio = local-filesystem analog,
    * consistent with this module's parquet-directory warehouse model;
    * a DFS deployment swaps in the Hadoop FileSystem API here.
    */
  def streamMaxId(spark: SparkSession, path: String, belowBatch: Long): Long =
    if (!Files.exists(Paths.get(path))) 0L
    else batchRows(spark, path).select(col("id"))
      .unionByName(streamRows(spark, path)
        .filter(col("__batch_id") < belowBatch).select(col("id")))
      .agg(coalesce(max("id"), lit(0L))).collect().head.getLong(0)

  /** The full table: batch-path rows at the root plus streamed rows
    * under `_stream/`, in declared column order. Stitching happens
    * here, at plan time, so every downstream read ([[dailyExport]],
    * [[maxId]], the close-out exports) sees one table regardless of
    * which path wrote which row.
    */
  def table(spark: SparkSession, path: String): DataFrame = {
    // partitionBy moves period_date last in the physical layout; restore
    // the declared column order (the positional CSV contract needs it).
    val df = batchRows(spark, path)
      .unionByName(streamRows(spark, path).drop("__batch_id"))
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
