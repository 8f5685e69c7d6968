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
  * Four parquet stores under one root: the band-signature store
  * (doc_id, band, key), the exact-shingle store (doc_id, sh), the
  * candidate-pair store (doc_a, doc_b), and the converged cluster
  * labels (doc_id, cluster_id). [[materialize]] builds all four from a
  * document set with the SAME machinery the registered queries use
  * (native minhash → banded keys → capped self-join → delta-iteration
  * fixpoint), so the from-scratch pair store is set-identical to the
  * oracle-checked `dedup_minhash_pairs`. [[append]] then grows the
  * index per arrival batch at RECTANGLE cost, never re-mining:
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
  * After an append, [[refreshLabels]] resumes the cluster fixpoint
  * WARM — stored labels as the start state, only the new edges'
  * endpoints as the frontier — so incremental clustering scales with
  * the changed neighborhood, cluster merges included; exact-Jaccard
  * verification joins the extended shingle store. Arrival doc_ids are
  * assumed NEW (an id re-appended would duplicate its rows — upstream
  * ingest dedup, `T3`, owns that invariant). DedupLayoutSpec proves
  * append+refresh ≡ from-scratch over the full corpus.
  */
object DedupLayout {

  private def bandsDir(root: String) = root.stripSuffix("/") + "/bands"
  private def shinglesDir(root: String) = root.stripSuffix("/") + "/shingles"
  private def pairsDir(root: String) = root.stripSuffix("/") + "/pairs"
  private def labelsDir(root: String) = root.stripSuffix("/") + "/labels"

  private def shingled(spark: SparkSession, docs: DataFrame): DataFrame =
    Tables.spread(spark, docs).select(col("doc_id"),
      call_function("graft_shingles", T.tokens(col("text")),
        lit(DedupQueries.ShingleN)).as("sh"))

  /** One-time build over `docs` (doc_id, text): bands, shingles, the
    * capped self-join candidate pairs, and the converged cluster labels.
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
    val edges = symmetricEdges(spark, root)
    val init = edges.select(col("src").as("node")).distinct()
      .select(col("node"), col("node").as("label"))
      .localCheckpoint()
    writeLabels(DedupQueries.propagateLabels(edges, init, init), root)
  }

  private def symmetricEdges(spark: SparkSession, root: String): DataFrame = {
    val p = pairs(spark, root).localCheckpoint()
    p.select(col("doc_a").as("src"), col("doc_b").as("dst"))
      .union(p.select(col("doc_b").as("src"), col("doc_a").as("dst")))
      .localCheckpoint()
  }

  private def writeLabels(labels: DataFrame, root: String): Unit =
    // the propagation result is eagerly checkpointed, so overwriting the
    // store it was warm-started from cannot read-while-write
    labels.select(col("node").as("doc_id"), col("label").as("cluster_id"))
      .write.mode("overwrite").parquet(labelsDir(root))

  /** Grow the index with an arrival batch (doc_id, text): new
    * candidates are every (arrival, existing-or-arrival) pair sharing a
    * band key, emitted id-ordered and deduplicated — exactly the pairs
    * a from-scratch rebuild would add. Returns the new pairs (eagerly
    * materialized) so [[refreshLabels]] can seed its frontier.
    */
  def append(spark: SparkSession, arrivals: DataFrame,
             root: String): DataFrame = {
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
      .localCheckpoint()
    newPairs.write.mode("append").parquet(pairsDir(root))
    newBands.write.mode("append").parquet(bandsDir(root))
    newPairs
  }

  /** Warm-start incremental clustering: resume the label-propagation
    * fixpoint from the STORED labels, with only the new edges'
    * endpoints as the frontier — per-iteration JOIN work scales with
    * the changed neighborhood, not the graph (the cold fixpoint's
    * round 0 is every node). Each refresh still reads the pair store
    * once to build the symmetric edge view; at deployment that table
    * is written partitioned by src so the frontier join prunes to the
    * touched partitions instead of scanning. Handles cluster MERGES: a
    * bridge pair lets the smaller cluster-min flow across, and each
    * changed node re-enters the frontier until the old cluster
    * interior is relabeled (monotone min-propagation from any state ≥
    * the fixpoint converges to the same components as a cold run).
    */
  def refreshLabels(spark: SparkSession, newPairs: DataFrame,
                    root: String): Unit = {
    val edges = symmetricEdges(spark, root)
    val old = labels(spark, root)
      .select(col("doc_id").as("node"), col("cluster_id").as("label"))
    val fresh = edges.select(col("src").as("node")).distinct()
      .join(old.select("node"), Seq("node"), "left_anti")
      .select(col("node"), col("node").as("label"))
    val init = old.unionByName(fresh).localCheckpoint()
    val touched = newPairs.select(col("doc_a").as("node"))
      .union(newPairs.select(col("doc_b").as("node"))).distinct()
    val frontier0 = init.join(touched, Seq("node"))
    writeLabels(DedupQueries.propagateLabels(edges, init, frontier0), root)
  }

  def labels(spark: SparkSession, root: String): DataFrame =
    spark.read.parquet(labelsDir(root))

  def pairs(spark: SparkSession, root: String): DataFrame =
    spark.read.parquet(pairsDir(root))

  def bands(spark: SparkSession, root: String): DataFrame =
    spark.read.parquet(bandsDir(root))

  def shingles(spark: SparkSession, root: String): DataFrame =
    spark.read.parquet(shinglesDir(root))
}
