package graft

import org.apache.spark.sql.functions._

/** Runtime bloom-filter join pruning — the third leg of the
  * shuffle-reduction story beside broadcast joins and co-bucketed
  * layouts. When a dimension side carries a SELECTIVE predicate,
  * Catalyst's `InjectRuntimeFilter` builds a bloom filter over the
  * dimension's surviving join keys and applies
  * `bloom_filter_might_contain` to the FACT side BEFORE its shuffle —
  * at 100 TB that is most of a fact-fact join's exchange bytes dropped
  * at the scan, for the cost of one aggregate over the filtered dim.
  *
  * The production thresholds are right for the real deployment
  * (creation side under 10 MB of plan stats, application side over
  * 10 GB — exactly the "selective dim against a huge fact" shape);
  * the test lowers the application floor so the sf0.001 fact
  * qualifies, then asserts injection, pruning semantics, and result
  * parity with the filter disabled.
  */
class RuntimeFilterSpec extends SparkSpec {

  test("a selective dim predicate injects a bloom filter ahead of the fact shuffle") {
    withConf(
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      // local parquet is tiny; the production 10 GB floor would (rightly)
      // judge the bloom filter not worth building here
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      // force the shuffled join: against a broadcast, the fact rows
      // would be filtered by the hash relation itself
      "spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      val urgent = Tables.orders(spark, Sf)
        .filter(col("o_orderpriority") === "1-URGENT")
        .select("o_orderkey", "o_orderpriority")
      val fact = Tables.lineitem(spark, Sf)
        .select("l_orderkey", "l_quantity")
      val joined = fact.join(urgent, col("l_orderkey") === col("o_orderkey"))
        .select("l_orderkey", "l_quantity", "o_orderpriority")
      val got = joined.collect()
        .map(r => (r.getLong(0), r.getDouble(1))).toSeq.sorted

      // the injected filter sits on the FACT side of the optimized plan:
      // might_contain(<bloom built from the filtered dim>) over the fact
      // join key, upstream of the exchange
      val optimized = joined.queryExecution.optimizedPlan.toString
      assert(optimized.contains("might_contain") &&
        optimized.contains("bloom_filter_agg"),
        s"expected an injected runtime bloom filter on the fact side:\n$optimized")

      // parity: the filter is might-contain (no false negatives), so the
      // join result must equal the un-filtered run
      val expected = withConf(
        "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "false") {
        fact.join(urgent, col("l_orderkey") === col("o_orderkey"))
          .select("l_orderkey", "l_quantity", "o_orderpriority")
          .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq.sorted
      }
      assert(got === expected,
        "runtime filtering must not change the join result")
      assert(got.nonEmpty, "the urgent-orders join must not be empty")
    }
  }
}
