package graft

import graft.operators._

/** Smoke + invariant tests for every registered query at sf0.001 (the
  * driver-smoke scale). The DuckDB hash-compare at sf0.01 is the real
  * correctness gate (Verify + tools/check_oracle.py); these assert the
  * engine-level contracts that survive any data: schema names, bounds,
  * and cross-query consistency.
  */
class QueriesSpec extends SparkSpec {

  test("entry returns a single top-revenue row") {
    val rows = SparkEntry.entry(spark).collect()
    assert(rows.length == 1)
    assert(rows.head.schema.fieldNames.contains("revenue"))
  }

  test("every query runs at sf0.001 and column names are stable") {
    SparkEntry.queries.foreach { case (name, fn) =>
      val df = fn(spark, Sf)
      val cols = df.columns
      assert(cols.nonEmpty, s"$name has no columns")
      assert(cols.distinct.length == cols.length, s"$name has duplicate column names")
      df.count() // forces execution
    }
  }

  test("every query with an oracle has matching registration") {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    assert(o.subsetOf(q), s"oracle without query: ${o -- q}")
    // sketches are algorithm-specific → deliberately rows-only
    val rowsOnly = Set("rel_approx_distinct", "rel_approx_quantiles")
    assert((q -- o) == rowsOnly, s"unexpected rows-only queries: ${q -- o -- rowsOnly}")
  }

  test("dedup pipeline: jaccard-verified pairs are a subset of candidates") {
    val cand = DedupQueries.minhashPairs(spark, Sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val verified = DedupQueries.jaccardPairs(spark, Sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(verified.subsetOf(cand))
    assert(verified.forall { case (a, b) => a < b })
  }

  test("similarity: ann results are a subset of brute-force ranking universe") {
    val exact = SimilarityQueries.topkCosine(spark, Sf).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val ann = SimilarityQueries.annLsh(spark, Sf).collect()
      .map(r => r.getLong(0) -> r.getDouble(1))
    // any ANN hit that also appears in exact top-k must carry the same score
    ann.foreach { case (id, c) =>
      exact.get(id).foreach(e => assert(e == c, s"score mismatch for vec $id"))
    }
    assert(ann.map(_._2).sorted.reverse.sameElements(ann.map(_._2)), "ann not sorted desc")
  }

  test("pairs threshold output respects bound and ordering contract") {
    val rows = SimilarityQueries.pairsThreshold(spark, Sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(0) < r.getLong(1))
      assert(r.getDouble(2) >= SimilarityQueries.PairThreshold)
      assert(r.getDouble(2) <= 1.0)
    }
  }

  test("block-decomposed pairs join equals the broadcast-kernel cross-check") {
    def key(r: org.apache.spark.sql.Row) = (r.getLong(0), r.getLong(1), r.getDouble(2))
    val blocked = SimilarityQueries.pairsThreshold(spark, Sf).collect().map(key).toSet
    val kernel = SimilarityQueries.pairsThresholdBroadcastKernel(spark, Sf).collect().map(key).toSet
    assert(blocked == kernel,
      s"only-blocked=${blocked -- kernel}, only-kernel=${kernel -- blocked}")
  }

  test("ivf multi-probe dominates single-probe rank-for-rank") {
    // multi-probe scans a SUPERSET of single-probe's candidates (q-cell
    // plus the next-nearest cells), so its k-th best cosine must be >=
    // single-probe's k-th best, and every single-probe score must be
    // matched or beaten at the same rank
    val single = SimilarityQueries.annIvf(spark, Sf).collect().map(_.getDouble(1))
    val multi = SimilarityQueries.annIvfMultiProbe(spark, Sf).collect().map(_.getDouble(1))
    assert(multi.length >= single.length)
    single.zip(multi).foreach { case (s1, m) => assert(m >= s1, s"rank dominated: $m < $s1") }
  }

  test("trained-quantizer ANN probes one learned cell with exact scores") {
    val rows = SimilarityQueries.annKmeans(spark, Sf).collect()
    assert(rows.nonEmpty && rows.length <= 10)
    val exact = SimilarityQueries.topkCosine(spark, Sf).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    rows.foreach { r =>
      // scores agree with the brute-force ranking where ids overlap
      exact.get(r.getLong(0)).foreach(e => assert(e == r.getDouble(1)))
      assert(r.getDouble(1) >= -1.0 && r.getDouble(1) <= 1.0)
    }
    val cos = rows.map(_.getDouble(1))
    assert(cos.sorted.reverse.sameElements(cos), "not sorted desc")
  }

  test("exact dedup groups partition the corpus") {
    val total = Tables.documents(spark, Sf).count()
    val grouped = DedupQueries.exact(spark, Sf)
      .agg(org.apache.spark.sql.functions.sum("n_docs")).collect().head.getLong(0)
    assert(grouped == total)
  }
}
