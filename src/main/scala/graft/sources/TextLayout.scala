package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.{TextFunctions => T}

/** Incremental token store on disk — the text twin of [[DedupLayout]] /
  * [[VectorLayout.append]]. Tokenize-and-explode is the dominant cost
  * of every vocabulary-shaped query (the reason TextQueries persists
  * its token store), so the exploded (doc_id, token) rows land in a
  * batch-partitioned parquet LOG: arrivals tokenize ONCE, and the
  * corpus-global aggregates re-derive from the extended store — they
  * must (a new batch can shift the global top-100 vocabulary, so a
  * snapshotted vocab would silently go stale; re-aggregation over the
  * already-tokenized log is the cheap term, map-side-combined on the
  * high-entropy token key).
  *
  * Idempotence: tokenization is a pure per-document function, so a
  * batch recomputes byte-identically and each append
  * dynamic-overwrites its own `__batch_id` partition — redelivery and
  * wiped-checkpoint replay add nothing (TextLayoutSpec checks counts,
  * not just sets).
  */
object TextLayout {

  private val BatchCol = "__batch_id"
  private val BaseBatch = -1L

  private def tokensDir(root: String) = root.stripSuffix("/") + "/tokens"

  private def exploded(spark: SparkSession, docs: DataFrame): DataFrame =
    Tables.spread(spark, docs)
      .select(col("doc_id"), explode(T.tokens(col("text"))).as("token"))

  /** One-time tokenize of `docs` (doc_id, text) into the base batch. */
  def materialize(spark: SparkSession, docs: DataFrame, root: String): Unit =
    exploded(spark, docs).withColumn(BatchCol, lit(BaseBatch))
      .write.mode("overwrite").partitionBy(BatchCol).parquet(tokensDir(root))

  /** Tokenize ONLY the arrival batch into its own partition. */
  def append(spark: SparkSession, arrivals: DataFrame, root: String,
             batchId: Long): Unit =
    exploded(spark, arrivals).withColumn(BatchCol, lit(batchId))
      .write
      .option("partitionOverwriteMode", "dynamic")
      .mode("overwrite")
      .partitionBy(BatchCol)
      .parquet(tokensDir(root))

  def tokens(spark: SparkSession, root: String): DataFrame =
    spark.read.parquet(tokensDir(root)).drop(BatchCol)

  /** The top-100 vocabulary re-derived from the log — the SAME
    * cutoff/tie-break code as the registered `text_token_freq`
    * ([[graft.operators.TextQueries.vocabOver]]), which TextLayoutSpec
    * holds it equal to.
    */
  def vocab(spark: SparkSession, root: String, k: Int = 100): DataFrame =
    graft.operators.TextQueries.vocabOver(tokens(spark, root), k)

  /** Per-(doc, token) term frequencies over the vocabulary — the tf
    * table, re-derived through the shared
    * [[graft.operators.TextQueries.tfOver]].
    */
  def termFreq(spark: SparkSession, root: String): DataFrame = {
    val t = tokens(spark, root)
    graft.operators.TextQueries.tfOver(t, graft.operators.TextQueries.vocabOver(t))
  }
}
