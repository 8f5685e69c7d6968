package graft

import java.nio.file.Files

import graft.operators.SimilarityQueries
import graft.sources.VectorLayout

/** The cell-partitioned ANN layout: the probe must be metadata
  * partition pruning (PartitionFilters on a literal cell id), its
  * results must equal the in-engine trained-quantizer probe, and the
  * directory layout must be one partition per trained cell.
  */
class VectorLayoutSpec extends SparkSpec {

  test("ANN probe over the cell-partitioned layout is partition pruning with exact parity") {
    val out = Files.createTempDirectory("graft-vectors").toString + "/vectors"
    VectorLayout.materialize(spark, Sf, out)

    val probe = VectorLayout.probe(spark, out)
    val plan = probe.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters"), plan)
    assert(plan.contains("cell"), plan)
    // the cell predicate must be pushed as a partition filter, not a
    // post-scan row filter over all partitions
    val pf = plan.linesIterator.find(_.contains("PartitionFilters")).get
    assert(pf.contains("cell"), pf)

    // result parity with the in-engine probe (same trained cells, same
    // rounding, same ordering)
    val got = probe.collect().map(r => (r.getLong(0), r.getDouble(1)))
    val want = SimilarityQueries.annKmeans(spark, Sf).collect()
      .map(r => (r.getLong(0), r.getDouble(1)))
    assert(got.sameElements(want),
      s"layout probe drifted from annKmeans:\n${got.mkString(",")}\nvs\n${want.mkString(",")}")

    // physical layout: one directory per trained cell
    val dirs = new java.io.File(out).listFiles().filter(_.isDirectory)
      .map(_.getName).filter(_.startsWith("cell="))
    assert(dirs.nonEmpty && dirs.length <= SimilarityQueries.NCells,
      s"expected <= ${SimilarityQueries.NCells} cell partitions, got ${dirs.length}")
    CacheLife.release(spark)
  }

  test("corpus-wide kNN read from the layout equals the session trained-quantizer kNN") {
    val out = Files.createTempDirectory("graft-vectors-knn").toString + "/vectors"
    VectorLayout.materialize(spark, Sf, out)
    // the serving twin: same probes, same candidates (stored cell
    // partition vs session assignment), same rerank arithmetic, same
    // tie-breaks — row-for-row
    def key(r: org.apache.spark.sql.Row) =
      (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))
    val got = VectorLayout.knn(spark, Sf, out).collect().map(key).toSet
    val want = SimilarityQueries.knnAnnKmeans(spark, Sf).collect().map(key).toSet
    assert(got.nonEmpty && got === want,
      s"layout kNN drifted from knnAnnKmeans: ${got.size} vs ${want.size} rows")
    // the hierarchical serving twin: same super training over the
    // stored codebook, same member ranking, same candidates/rerank —
    // row-for-row against the session two-level probe
    val gotH = VectorLayout.knnHier(spark, Sf, out).collect().map(key).toSet
    val wantH = SimilarityQueries.knnAnnHier(spark, Sf).collect().map(key).toSet
    assert(gotH.nonEmpty && gotH === wantH,
      s"layout hier kNN drifted from knnAnnHier: ${gotH.size} vs ${wantH.size} rows")
    // the composed (IMI+IVFADC) serving twin: two-level probe over the
    // stored codebook, PQ codes computed for the STORED vectors with
    // the session-trained subspace codebooks, shared ADC arithmetic,
    // exact rerank over stored floats — row-for-row against the
    // session composition
    val gotHP = VectorLayout.knnHierPq(spark, Sf, out).collect().map(key).toSet
    val wantHP = SimilarityQueries.knnAnnHierPq(spark, Sf).collect().map(key).toSet
    assert(gotHP.nonEmpty && gotHP === wantHP,
      s"layout hier+PQ kNN drifted from knnAnnHierPq: ${gotHP.size} vs ${wantHP.size} rows")
    CacheLife.release(spark)
  }

  test("knnAuto dispatches the serving probe by the store-context policy") {
    // the pure threshold (no corpus count in the store context): hier
    // iff trained K >= HierProbeStoreMinK, pinned from the measured
    // 2.01x serving win at the contract-resolved K=633 (KSWEEP.json)
    assert(SimilarityQueries.probeModeForStore(
      SimilarityQueries.AutoProbe, SimilarityQueries.HierProbeStoreMinK - 1) == "flat")
    assert(SimilarityQueries.probeModeForStore(
      SimilarityQueries.AutoProbe, SimilarityQueries.HierProbeStoreMinK) == "hier")
    // explicit modes always override the policy
    assert(SimilarityQueries.probeModeForStore("flat", 10000) == "flat")
    assert(SimilarityQueries.probeModeForStore("hier", 2) == "hier")
    intercept[IllegalArgumentException] {
      SimilarityQueries.probeModeForStore("bogus", 100)
    }
    val out = Files.createTempDirectory("graft-vectors-auto").toString + "/vectors"
    VectorLayout.materialize(spark, Sf, out)
    def key(r: org.apache.spark.sql.Row) =
      (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))
    // at the spec store's K=8 < threshold, auto serves the flat path —
    // output IDENTICAL to the explicit flat read (the dispatcher adds
    // a policy, never a third semantics)
    val got = VectorLayout.knnAuto(spark, Sf, out).collect().map(key).toSet
    val flat = VectorLayout.knn(spark, Sf, out).collect().map(key).toSet
    assert(got.nonEmpty && got === flat)
    // explicit hier through the dispatcher = the explicit hier read
    val gotH = withConf(SimilarityQueries.ProbeKey -> "hier") {
      VectorLayout.knnAuto(spark, Sf, out).collect().map(key).toSet
    }
    val hier = VectorLayout.knnHier(spark, Sf, out).collect().map(key).toSet
    assert(gotH === hier)
    CacheLife.release(spark)
  }

  test("the layout pins its (K, assign) knobs: mismatched sessions refuse; hier parity holds at a knobbed K") {
    val out = Files.createTempDirectory("graft-vectors-pin").toString + "/vectors"
    def key(r: org.apache.spark.sql.Row) =
      (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))
    withConf(SimilarityQueries.NCellsKey -> "13") {
      VectorLayout.materialize(spark, Sf, out)
      // serving parity at a K where trained cells CAN die (round-15
      // advice: the store twin used to derive K2 from the SURVIVING
      // centroid count while the session twin used the configured K —
      // parity only held at K=8, where every cell survives; both now
      // derive K2 from the pinned/configured K)
      val gotH = VectorLayout.knnHier(spark, Sf, out).collect().map(key).toSet
      val wantH = SimilarityQueries.knnAnnHier(spark, Sf).collect().map(key).toSet
      assert(gotH.nonEmpty && gotH === wantH,
        s"layout hier kNN drifted from knnAnnHier at K=13: ${gotH.size} vs ${wantH.size}")
    }
    // the session now resolves the compiled default K — on a plain
    // (codebook-less) layout the fallback session model would be a
    // DIFFERENT quantizer than the one that wrote the cells: refused
    // loudly (the SubstrLayout width-pin discipline), never a silent
    // wrong-partition probe
    val e = intercept[IllegalArgumentException] {
      VectorLayout.knn(spark, Sf, out).collect()
    }
    assert(e.getMessage.contains("ncells=13"),
      s"refusal must name the pinned knobs: ${e.getMessage}")
    // back under the pinned K the layout serves again
    withConf(SimilarityQueries.NCellsKey -> "13") {
      assert(VectorLayout.knn(spark, Sf, out).collect().nonEmpty)
    }
    CacheLife.release(spark)
  }
}
