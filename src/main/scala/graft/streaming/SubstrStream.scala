package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types._
import org.apache.spark.sql.SparkSession

import graft.sources.SubstrLayout

/** Streaming ingest into the incremental winnowed-fingerprint store:
  * documents ARRIVE as a stream and each micro-batch fingerprints ONCE
  * into its own partitions of the fingerprint log and the hash-count
  * partials — batch/stream parity for the substring-dedup family, the
  * same contract [[DedupStream]]/[[TextStream]]/[[VectorStream]] give
  * the other three index families.
  *
  * Exactly-once: winnowing is a pure per-document function and each
  * store write is a dynamic overwrite of the micro-batch's OWN
  * `__batch_id` partition, so a redelivered batch or a full replay
  * from a wiped checkpoint rewrites byte-identical files
  * (SubstrLayoutSpec proves replay idempotence with COUNTS). The span
  * view is a DERIVED artifact re-read from the current totals after a
  * drain ([[SubstrLayout.spans]]) — an append can flip a hash's global
  * count 1 → 2 and retroactively mark documents ingested long ago, so
  * per-batch span materialization would be wrong, not just slow.
  * [[graft.StoreMaintain]] folds the accreted batch partitions between
  * drains ([[SubstrLayout.compact]]).
  */
object SubstrStream {

  /** File-source schema of arriving documents. */
  val schema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType)))

  def read(spark: SparkSession, dir: String, maxFilesPerTrigger: Int = 1): DataFrame =
    spark.readStream
      .schema(schema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .parquet(dir)

  def ingestSink(docs: DataFrame, root: String,
                 checkpoint: String): StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        SubstrLayout.append(batch.sparkSession, batch, root, batchId)
        ()
      }
      .start()
}
