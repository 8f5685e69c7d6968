package graft

import graft.operators.{DedupQueries, SimilarityQueries, TextQueries}

/** Runnable documentation for the curation surface: the end-to-end
  * workflow a training-data team runs — dedup, decontaminate, score,
  * mix, split, pack — each stage one registered (oracle-checked)
  * query, sharing the CacheLife-memoized index stores so the whole
  * pipeline costs one candidate generation, one cluster fixpoint, one
  * trained model.
  *
  * `sbt "runMain graft.CurationDemo [sfDir] [storeRoot]"`
  *
  * With the optional second arg, every shared store loads-or-builds
  * under that root instead of session memory ([[CacheLife.RootKey]]):
  * run [[StoreBuild]] first and this demo answers every stage from the
  * on-disk artifacts with zero retraining — the consumer half of the
  * build-once / read-for-weeks lifecycle.
  */
object CurationDemo {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local()
    val sf = args.headOption.getOrElse("/root/testdata/sf0.001")
    args.lift(1).foreach(root => spark.conf.set(CacheLife.RootKey, root))
    def show(title: String, name: String, n: Int = 8): Unit = {
      println(s"\n=== $title  [$name]")
      SparkEntry.queries(name)(spark, sf).show(n, truncate = false)
    }

    // 1. What's duplicated, and where it comes from
    show("Near-dup clusters (LSH → connected components)", "dedup_clusters")
    show("Cross-source duplication matrix", "dedup_source_matrix")
    show("Corpus after dedup (one survivor per cluster)", "dedup_survivors")

    // 2. Is eval leaking into train?
    show("Decontamination report (worst eval offenders)", "dedup_contamination_report")

    // 3. Score, then decide the mix
    show("Per-source scorecard", "text_source_scorecard")
    show("Corpus funnel (survivors per curation stage)", "text_corpus_funnel")
    show("Training-mix sample (per-source rates)", "text_sample_mix")
    show("Train/val/test balance", "text_split_report")
    show("Curriculum phases (quality quartiles)", "text_curriculum")

    // 4. Lay out the training run
    show("Context packing plan (shard, token-budget bin)", "text_pack_contexts")
    show("Packing fill audit", "text_pack_stats")

    // 5. Embedding-side: semantic dedup + the ANN index health checks
    show("Semantic dedup verdicts (SemDeDup)", "sim_semantic_dedup")
    show("ANN recall report (every lossy variant)", "sim_ann_recall")
    println(s"\nPQ compression: ${SimilarityQueries.PqM} codes/vector " +
      s"(${SimilarityQueries.PqK} centroids each) vs 64 floats raw")

    CacheLife.release(spark)
    spark.stop()
  }
}
