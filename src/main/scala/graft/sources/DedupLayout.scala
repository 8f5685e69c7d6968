package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.{TextFunctions => T}
import graft.operators.DedupQueries

/** Incremental near-dup index on disk — the dedup twin of
  * [[VectorLayout.append]] (corpora GROW; a 100 TB pipeline cannot
  * re-mine candidate pairs from scratch per crawl batch).
  *
  * Three parquet stores under one root: the band-signature store
  * (doc_id, band, key), the exact-shingle store (doc_id, sh), and the
  * candidate-pair store (doc_a, doc_b). [[materialize]] builds all
  * three from a document set with the SAME machinery the registered
  * queries use (native minhash → banded keys → capped self-join), so
  * the from-scratch pair store is set-identical to the oracle-checked
  * `dedup_minhash_pairs`. [[append]] then grows the index per arrival
  * batch at RECTANGLE cost, never re-mining:
  *
  *   - arrivals shingle + band once (one pass over the batch);
  *   - new candidates come from ONE equi-join of the arrival bands
  *     against (existing ∪ arrival) bands — each join group is
  *     |batch ∩ bucket| × |bucket|, bounded by the batch size per
  *     bucket (the stream-join rectangle), never the |bucket|²/2 the
  *     self-join cap exists for;
  *   - all three stores extend by parquet append, touching no existing
  *     file.
  *
  * Downstream artifacts derive from the pair store: the cluster
  * fixpoint re-runs over updated pairs (cheap relative to candidate
  * mining — delta-iteration converges from the changed frontier), and
  * exact-Jaccard verification joins the extended shingle store.
  * Arrival doc_ids are assumed NEW (an id re-appended would duplicate
  * its rows — upstream ingest dedup, `T3`, owns that invariant).
  * DedupLayoutSpec proves append ≡ from-scratch over the full corpus.
  */
object DedupLayout {

  private def bandsDir(root: String) = root.stripSuffix("/") + "/bands"
  private def shinglesDir(root: String) = root.stripSuffix("/") + "/shingles"
  private def pairsDir(root: String) = root.stripSuffix("/") + "/pairs"

  private def shingled(spark: SparkSession, docs: DataFrame): DataFrame =
    Tables.spread(spark, docs).select(col("doc_id"),
      call_function("graft_shingles", T.tokens(col("text")),
        lit(DedupQueries.ShingleN)).as("sh"))

  /** One-time build over `docs` (doc_id, text): bands, shingles, and
    * the capped self-join candidate pairs.
    */
  def materialize(spark: SparkSession, docs: DataFrame, root: String): Unit = {
    val sh = shingled(spark, docs)
    sh.write.mode("overwrite").parquet(shinglesDir(root))
    val bands = DedupQueries.lshBandsOver(
      spark.read.parquet(shinglesDir(root)))
    bands.write.mode("overwrite").parquet(bandsDir(root))
    DedupQueries.bandPairsCapped(spark.read.parquet(bandsDir(root)),
        DedupQueries.MaxBucket)
      .write.mode("overwrite").parquet(pairsDir(root))
  }

  /** Grow the index with an arrival batch (doc_id, text): new
    * candidates are every (arrival, existing-or-arrival) pair sharing a
    * band key, emitted id-ordered and deduplicated — exactly the pairs
    * a from-scratch rebuild would add.
    */
  def append(spark: SparkSession, arrivals: DataFrame, root: String): Unit = {
    val newSh = shingled(spark, arrivals)
    newSh.write.mode("append").parquet(shinglesDir(root))
    val newBands = DedupQueries.lshBandsOver(newSh)
      .localCheckpoint() // the rectangle join + store append both read it
    val existing = spark.read.parquet(bandsDir(root))
    val newPairs = newBands.as("n")
      .join(existing.unionByName(newBands).as("u"), Seq("band", "key"))
      .filter(col("n.doc_id") =!= col("u.doc_id"))
      .select(least(col("n.doc_id"), col("u.doc_id")).as("doc_a"),
        greatest(col("n.doc_id"), col("u.doc_id")).as("doc_b"))
      .distinct()
    newPairs.write.mode("append").parquet(pairsDir(root))
    newBands.write.mode("append").parquet(bandsDir(root))
  }

  def pairs(spark: SparkSession, root: String): DataFrame =
    spark.read.parquet(pairsDir(root))

  def bands(spark: SparkSession, root: String): DataFrame =
    spark.read.parquet(bandsDir(root))

  def shingles(spark: SparkSession, root: String): DataFrame =
    spark.read.parquet(shinglesDir(root))
}
