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
  private def labelsMetaDir(root: String) =
    root.stripSuffix("/") + "/labels__covered"

  /** Every growing store is partitioned by the batch that wrote it, and
    * each batch writes with DYNAMIC partition overwrite: a redelivered
    * batch replaces its own partition with byte-identical content (the
    * build is deterministic), so the at-least-once delivery of
    * `foreachBatch` becomes exactly-once on disk — the
    * [[graft.streaming.CandleStream]] warehouse idiom applied to the
    * index. The base build owns batch -1.
    */
  private val BatchCol = "__batch_id"
  private val BaseBatch = -1L

  /** Dynamic overwrite: replaces ONLY this batch's partition. */
  private def writeBatch(df: DataFrame, batchId: Long, dir: String): Unit =
    df.withColumn(BatchCol, lit(batchId))
      .write
      .option("partitionOverwriteMode", "dynamic")
      .mode("overwrite")
      .partitionBy(BatchCol)
      .parquet(dir)

  /** Static overwrite: a fresh base build wipes every earlier batch. */
  private def writeBase(df: DataFrame, dir: String): Unit =
    df.withColumn(BatchCol, lit(BaseBatch))
      .write.mode("overwrite").partitionBy(BatchCol).parquet(dir)

  private def shingled(spark: SparkSession, docs: DataFrame): DataFrame =
    Tables.spread(spark, docs).select(col("doc_id"),
      call_function("graft_shingles", T.tokens(col("text")),
        lit(DedupQueries.ShingleN)).as("sh"))

  /** One-time build over `docs` (doc_id, text): bands, shingles, the
    * capped self-join candidate pairs, and the converged cluster labels.
    */
  def materialize(spark: SparkSession, docs: DataFrame, root: String): Unit = {
    writeBase(shingled(spark, docs), shinglesDir(root))
    writeBase(DedupQueries.lshBandsOver(shingles(spark, root)), bandsDir(root))
    writeBase(DedupQueries.bandPairsCapped(bands(spark, root),
      DedupQueries.MaxBucket), pairsDir(root))
    val edges = symmetricEdges(spark, root)
    val init = edges.select(col("src").as("node")).distinct()
      .select(col("node"), col("node").as("label"))
      .localCheckpoint()
    writeLabels(DedupQueries.propagateLabels(edges, init, init),
      coveredBatch = BaseBatch, root)
  }

  private def symmetricEdges(spark: SparkSession, root: String): DataFrame = {
    val p = pairs(spark, root).localCheckpoint()
    p.select(col("doc_a").as("src"), col("doc_b").as("dst"))
      .union(p.select(col("doc_b").as("src"), col("doc_a").as("dst")))
      .localCheckpoint()
  }

  /** Labels land with a WATERMARK: the highest pair batch they cover.
    * [[refreshLabels]] derives its frontier from everything after it,
    * so no caller can hand it a too-small delta and get silently wrong
    * clusters.
    */
  private def writeLabels(labels: DataFrame, coveredBatch: Long,
                          root: String): Unit = {
    // the propagation result is eagerly checkpointed, so overwriting the
    // store it was warm-started from cannot read-while-write
    labels.select(col("node").as("doc_id"), col("label").as("cluster_id"))
      .write.mode("overwrite").parquet(labelsDir(root))
    val s = labels.sparkSession
    import s.implicits._
    Seq(coveredBatch).toDF("covered_batch").coalesce(1)
      .write.mode("overwrite").parquet(labelsMetaDir(root))
  }

  /** Grow the index with an arrival batch (doc_id, text): new
    * candidates are every (arrival, existing-or-arrival) pair sharing a
    * band key, emitted id-ordered and deduplicated — exactly the pairs
    * a from-scratch rebuild would add. Returns the new pairs (eagerly
    * materialized) for observability; [[refreshLabels]] derives its own
    * frontier from the store's batch watermark.
    *
    * `batchId` must be MONOTONICALLY increasing across appends (a
    * streaming sink passes the micro-batch id, which is; a batch
    * caller numbers its loads). The batch's pair mining joins ONLY the
    * band-store PREFIX `__batch_id < batchId` — the state as of this
    * batch's first attempt — so recomputing any batch at any time
    * (redelivery, or a full replay from a wiped checkpoint that runs
    * while later partitions still exist) rewrites its partition
    * byte-identically instead of double-mining later batches' pairs.
    */
  def append(spark: SparkSession, arrivals: DataFrame, root: String,
             batchId: Long): DataFrame = {
    val newSh = shingled(spark, arrivals).localCheckpoint()
    val newBands = DedupQueries.lshBandsOver(newSh)
      .localCheckpoint() // the rectangle join + store write both read it
    val existing = bands(spark, root, beforeBatch = Some(batchId))
    val newPairs = newBands.as("n")
      .join(existing.unionByName(newBands).as("u"), Seq("band", "key"))
      .filter(col("n.doc_id") =!= col("u.doc_id"))
      .select(least(col("n.doc_id"), col("u.doc_id")).as("doc_a"),
        greatest(col("n.doc_id"), col("u.doc_id")).as("doc_b"))
      .distinct()
      .localCheckpoint()
    writeBatch(newSh, batchId, shinglesDir(root))
    writeBatch(newPairs, batchId, pairsDir(root))
    writeBatch(newBands, batchId, bandsDir(root))
    newPairs
  }

  /** Warm-start incremental clustering: resume the label-propagation
    * fixpoint from the STORED labels. The frontier is derived
    * STRUCTURALLY — every pair batch after the labels' covered
    * watermark contributes its endpoints — so correctness never
    * depends on a caller assembling the right delta (round-7 review
    * finding: a caller passing only the LAST append's pairs after two
    * appends would get silently wrong clusters). Per-iteration JOIN
    * work scales with the changed neighborhood, not the graph (the
    * cold fixpoint's round 0 is every node). Each refresh still reads
    * the pair store once to build the symmetric edge view; at
    * deployment that table is written partitioned by src so the
    * frontier join prunes to the touched partitions instead of
    * scanning. Handles cluster MERGES: a bridge pair lets the smaller
    * cluster-min flow across, and each changed node re-enters the
    * frontier until the old cluster interior is relabeled (monotone
    * min-propagation from any state ≥ the fixpoint converges to the
    * same components as a cold run). A refresh with nothing new is a
    * no-op.
    */
  def refreshLabels(spark: SparkSession, root: String): Unit = {
    val covered = spark.read.parquet(labelsMetaDir(root)).head.getLong(0)
    val maxBatch = spark.read.parquet(pairsDir(root))
      .agg(max(col(BatchCol).cast("long"))).head.getLong(0)
    if (maxBatch <= covered) return
    val newPairs = readStore(spark, pairsDir(root), None,
      afterBatch = Some(covered)).localCheckpoint()
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
    writeLabels(DedupQueries.propagateLabels(edges, init, frontier0),
      coveredBatch = maxBatch, root)
  }

  def labels(spark: SparkSession, root: String): DataFrame =
    spark.read.parquet(labelsDir(root))

  private def readStore(spark: SparkSession, dir: String,
                        beforeBatch: Option[Long],
                        afterBatch: Option[Long] = None): DataFrame = {
    val t = spark.read.parquet(dir)
    // batch filters ride the partition column: metadata pruning, the
    // excluded partitions' files are never listed into the scan
    val lo = afterBatch.fold(t)(b => t.filter(col(BatchCol) > b))
    beforeBatch.fold(lo)(b => lo.filter(col(BatchCol) < b)).drop(BatchCol)
  }

  def pairs(spark: SparkSession, root: String): DataFrame =
    readStore(spark, pairsDir(root), None)

  def bands(spark: SparkSession, root: String,
            beforeBatch: Option[Long] = None): DataFrame =
    readStore(spark, bandsDir(root), beforeBatch)

  def shingles(spark: SparkSession, root: String): DataFrame =
    readStore(spark, shinglesDir(root), None)
}
