package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.operators.SimilarityQueries

/** Adversarial hot-cell skew for the corpus-wide kNN join (round-15
  * verdict #6): a pathological corpus — near-duplicate embeddings, so
  * almost every vector lands in ONE coarse cell — turns the cell
  * equi-join's hot partition into a straggler task at scale. The LSH
  * dedup kernel is skew-hardened and adversarially spec'd
  * (DedupSkewSpec); this is the same discipline for [[SimilarityQueries
  * .knnAnn]]: under AQE's skew-join split (the registered mitigation —
  * the candidate join is a plain SortMergeJoin on the cell key, exactly
  * the shape OptimizeSkewedJoin exists for, and the per-source window
  * after it re-shuffles by qid anyway so the split costs no extra
  * exchange) the output must be IDENTICAL and the adaptive plan must
  * actually show the skew handling engaged.
  */
class SimKnnSkewSpec extends SparkSpec {
  import spark.implicits._

  private val N = 500
  // PqM x PqSubDim: the composed hier+PQ variant slices compiled
  // subspaces, so the adversarial fixture carries the production width
  private val Dim = 64

  /** One dominant cell by construction: seeds (vec_ids 1..NCells) are
    * the standard basis directions, every other vector is a small
    * deterministic perturbation of seed 1's direction — distinct rows
    * (no degenerate exact dup), one cell. */
  private lazy val skewDir: String = {
    val dir = Files.createTempDirectory("graft-knn-skew").toString
    val rows = (1L to N.toLong).map { id =>
      val v = Array.fill(Dim)(0.0f)
      if (id <= SimilarityQueries.NCells) v((id - 1).toInt) = 1.0f
      else {
        v(0) = 1.0f
        v(1 + (id % (Dim - 2)).toInt) = 0.001f * ((id % 13) + 1)
      }
      (id, v.toSeq, (id % 3).toInt)
    }
    rows.toDF("vec_id", "embedding", "label")
      .repartition(4)
      .write.parquet(s"$dir/embeddings.parquet")
    dir
  }

  private def knnKey(r: org.apache.spark.sql.Row) =
    (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))

  test("the fixture really is hot: one cell holds nearly the whole corpus") {
    val hist = SimilarityQueries.ivfCells(spark, skewDir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val hot = hist.values.max
    assert(hot >= N - SimilarityQueries.NCells,
      s"adversarial corpus must concentrate in one cell, got $hist")
    CacheLife.release(spark)
  }

  // thresholds scaled to the fixture (the defaults are 256 MB-class;
  // the MECHANISM, not the production numbers, is what the spec pins)
  private val skewConfs = Seq(
    "spark.sql.adaptive.enabled" -> "true",
    "spark.sql.adaptive.skewJoin.enabled" -> "true",
    "spark.sql.adaptive.forceOptimizeSkewedJoin" -> "true",
    "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "1.0",
    "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "4KB",
    "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "4KB")

  /** The two assertions every variant must hold under the hot cell:
    * the adaptive plan shows the skew mitigation ENGAGED (split
    * shuffle reader / skew=true join marker), and the output is
    * IDENTICAL with skew handling off — the split is pure execution
    * re-planning, never a semantics change. CacheLife is released
    * between the two runs: the kNN outputs are memoized per knob key
    * (round-17), and an un-released cache would compare a frame
    * against itself.
    */
  private def assertSkewHardened(
      name: String,
      q: () => org.apache.spark.sql.DataFrame): Unit = {
    CacheLife.release(spark)
    val (skewRows, skewPlan) = withConf(skewConfs: _*) {
      val df = q()
      val rows = df.collect().map(knnKey).toSet
      (rows, df.queryExecution.executedPlan.toString)
    }
    assert(skewPlan.contains("skew=true") ||
      skewPlan.toLowerCase.contains("skewed"),
      s"$name: expected a skew-split marker in the adaptive plan:\n$skewPlan")
    CacheLife.release(spark)
    val plainRows = withConf(
      "spark.sql.adaptive.skewJoin.enabled" -> "false") {
      q().collect().map(knnKey).toSet
    }
    assert(skewRows.nonEmpty && skewRows == plainRows,
      s"$name: skew-split changed the kNN output: " +
        s"${skewRows.size} vs ${plainRows.size} rows")
    CacheLife.release(spark)
  }

  test("AQE skew-split engages on the hot cell join and the output is identical") {
    assertSkewHardened("knnAnn",
      () => SimilarityQueries.knnAnn(spark, skewDir))
  }

  // round-16 verdict #5: the flat path's mitigation must be ASSERTED,
  // not assumed, on the other cell-equi-join shapes — the two-level
  // probe's candidate join and the composed hier+PQ form, whose
  // merge-hinted CODE join is a second skew surface (the PQ code table
  // concentrates in the same hot cell the raw vectors do)
  test("AQE skew-split engages on the two-level probe's hot candidate join") {
    assertSkewHardened("knnAnnHier",
      () => SimilarityQueries.knnAnnHier(spark, skewDir))
  }

  test("AQE skew-split engages on the composed hier+PQ hot code join") {
    assertSkewHardened("knnAnnHierPq",
      () => SimilarityQueries.knnAnnHierPq(spark, skewDir))
  }
}
