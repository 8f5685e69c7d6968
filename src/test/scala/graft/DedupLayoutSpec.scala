package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.operators.DedupQueries
import graft.sources.DedupLayout

/** The incremental near-dup index: growing the on-disk candidate store
  * batch by batch must land on EXACTLY the pair set a from-scratch
  * build mines — and the from-scratch build must equal the registered
  * (oracle-checked) `dedup_minhash_pairs` candidates.
  */
class DedupLayoutSpec extends SparkSpec {

  private def pairSet(root: String): Set[(Long, Long)] =
    DedupLayout.pairs(spark, root).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

  test("two appended batches converge to the from-scratch index and the registered candidates") {
    val docs = Tables.documents(spark, Sf).select(col("doc_id"), col("text"))
    val inc = Files.createTempDirectory("graft-dl-inc").toString
    val scratch = Files.createTempDirectory("graft-dl-full").toString

    // base 3/5 of the corpus, then two arrival batches — a cross-batch
    // near-dup pair (batch1 doc ~ batch2 doc) must still be found,
    // because batch2 joins bands that already include batch1
    val m = col("doc_id") % 5
    DedupLayout.materialize(spark, docs.filter(m < 3), inc)
    DedupLayout.append(spark, docs.filter(m === 3), inc, batchId = 0L)
    DedupLayout.append(spark, docs.filter(m === 4), inc, batchId = 1L)
    // ONE refresh covering BOTH appended batches (the round-7 review
    // trap: a frontier built from only the last batch's pairs would
    // silently mislabel batch-0 docs) — the watermark derives the full
    // delta structurally
    DedupLayout.refreshLabels(spark, inc)

    DedupLayout.materialize(spark, docs, scratch)

    val grown = pairSet(inc)
    val rebuilt = pairSet(scratch)
    assert(grown === rebuilt,
      s"incremental index drifted: ${grown.size} vs ${rebuilt.size} pairs; " +
        s"missing=${(rebuilt -- grown).take(5)} extra=${(grown -- rebuilt).take(5)}")

    val registered = DedupQueries.minhashPairs(spark, Sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(rebuilt === registered,
      "the layout's from-scratch pairs must equal the oracle-checked candidates")

    // store invariants: id-ordered, duplicate-free
    assert(grown.forall { case (a, b) => a < b })
    val n = DedupLayout.pairs(spark, inc).count()
    assert(n === grown.size.toLong, s"pair store holds $n rows for ${grown.size} pairs")

    // the extended band/shingle stores cover the whole corpus
    assert(DedupLayout.shingles(spark, inc).select("doc_id").distinct().count()
      === docs.count())

    // warm-started labels equal the cold fixpoint AND the registered
    // oracle-checked clusters over the full corpus
    def labelSet(root: String) = DedupLayout.labels(spark, root).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val warm = labelSet(inc)
    assert(warm === labelSet(scratch),
      "warm-started incremental labels drifted from the cold fixpoint")
    val regLabels = DedupQueries.clusters(spark, Sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(warm === regLabels,
      "incremental labels must equal the registered dedup_clusters")

    // a refresh with nothing new is a watermark no-op
    DedupLayout.refreshLabels(spark, inc)
    assert(labelSet(inc) === warm)
    CacheLife.release(spark)
  }

  test("a warm refresh prunes the edge scan to the affected components' buckets") {
    val docs = Tables.documents(spark, Sf).select(col("doc_id"), col("text"))
    val root = Files.createTempDirectory("graft-dl-prune").toString
    val m = col("doc_id") % 5
    DedupLayout.materialize(spark, docs.filter(m < 4), root)
    val newPairs = DedupLayout.append(spark, docs.filter(m === 4), root, batchId = 0L)

    // the bucket list is derived from the touched components — for a
    // 1/5-corpus arrival it must be a strict subset of the bucket space
    val buckets = DedupLayout.frontierBuckets(spark, root, newPairs)
    assert(buckets.nonEmpty && buckets.size < DedupLayout.EdgeBuckets,
      s"a small frontier must not demand every bucket: ${buckets.size}/${DedupLayout.EdgeBuckets}")

    // and the pruned view reaches the scan as PartitionFilters on
    // src_bucket — metadata pruning, not a post-scan row filter
    val pruned = DedupLayout.edgesView(spark, root, Some(buckets))
    pruned.count()
    val plan = pruned.queryExecution.executedPlan.toString
    val pf = plan.linesIterator.find(_.contains("PartitionFilters"))
    assert(pf.exists(_.contains("src_bucket")),
      s"expected src_bucket PartitionFilters:\n$plan")
    CacheLife.release(spark)
  }

  test("append guard: same-id replay succeeds, new-id replay raises") {
    val docs = Tables.documents(spark, Sf).select(col("doc_id"), col("text"))
    val root = Files.createTempDirectory("graft-dl-guard2").toString
    val m = col("doc_id") % 5
    DedupLayout.materialize(spark, docs.filter(m < 4), root)
    DedupLayout.append(spark, docs.filter(m === 4), root, batchId = 0L)
    val before = DedupLayout.pairs(spark, root).count()

    DedupLayout.append(spark, docs.filter(m === 4), root, batchId = 0L)
    assert(DedupLayout.pairs(spark, root).count() === before,
      "same-batch-id replay must leave the store unchanged")

    val e = intercept[Exception] {
      DedupLayout.append(spark, docs.filter(m === 4), root, batchId = 1L)
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ messages(x.getCause))
    assert(messages(e).exists(_.contains("already exists in the index prefix")),
      s"expected the replay refusal, got: ${messages(e).mkString(" | ")}")
    CacheLife.release(spark)
  }

  test("pure-streaming bootstrap: appends onto an EMPTY root converge to the rebuild") {
    val docs = Tables.documents(spark, Sf).select(col("doc_id"), col("text"))
    val root = Files.createTempDirectory("graft-dl-boot").toString
    val scratch = Files.createTempDirectory("graft-dl-boot-full").toString
    val m = col("doc_id") % 3

    // NO materialize: the first append is the base the next batches join
    DedupLayout.append(spark, docs.filter(m === 0), root, batchId = 0L)
    DedupLayout.append(spark, docs.filter(m === 1), root, batchId = 1L)
    DedupLayout.append(spark, docs.filter(m === 2), root, batchId = 2L)
    // no labels store yet either: refresh must cold-build, not die
    DedupLayout.refreshLabels(spark, root)

    DedupLayout.materialize(spark, docs, scratch)
    assert(pairSet(root) === pairSet(scratch),
      "bootstrap-grown pairs drifted from the from-scratch build")
    def labelSet(r: String) = DedupLayout.labels(spark, r).collect()
      .map(x => (x.getLong(0), x.getLong(1))).toSet
    assert(labelSet(root) === labelSet(scratch),
      "bootstrap labels drifted from the cold fixpoint")

    // a second refresh is a watermark no-op; a later append + refresh
    // takes the WARM path over the bootstrapped state
    DedupLayout.refreshLabels(spark, root)
    assert(labelSet(root) === labelSet(scratch))
    CacheLife.release(spark)
  }

  test("warm-start propagation merges two stored clusters across a bridge edge") {
    import spark.implicits._
    // stored state: components {1,2} (label 1) and {10,11} (label 10);
    // a new edge 2—10 must relabel the whole second cluster to 1, with
    // ONLY the bridge endpoints as the starting frontier
    val oldPairs = Seq((1L, 2L), (10L, 11L))
    val bridge = Seq((2L, 10L))
    val all = (oldPairs ++ bridge).toDF("doc_a", "doc_b").localCheckpoint()
    val edges = all.select(col("doc_a").as("src"), col("doc_b").as("dst"))
      .union(all.select(col("doc_b").as("src"), col("doc_a").as("dst")))
      .localCheckpoint()
    val init = Seq((1L, 1L), (2L, 1L), (10L, 10L), (11L, 10L))
      .toDF("node", "label").localCheckpoint()
    val frontier0 = init.filter(col("node").isin(2L, 10L))
    val labels = DedupQueries.propagateLabels(edges, init, frontier0)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(labels === Map(1L -> 1L, 2L -> 1L, 10L -> 1L, 11L -> 1L),
      s"the bridge must merge both clusters to label 1, got $labels")
  }
}
