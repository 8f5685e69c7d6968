package graft

import graft.operators._

/** Physical-plan assertions: the scale properties SURVEY §4 promises
  * must be visible in `executedPlan`, not just claimed in scaladoc.
  * (BucketedLayoutSpec and PartitionedLayoutSpec assert the layout-
  * dependent ones; MultimodalSpec asserts payload pruning.)
  */
class PlanQualitySpec extends SparkSpec {

  private def plan(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("column projection prunes the parquet read schema") {
    val p = plan(CoreQueries.projection(spark, Sf))
    assert(p.contains("ReadSchema"))
    val read = p.linesIterator.find(_.contains("ReadSchema")).get
    assert(read.contains("l_orderkey") && read.contains("l_quantity"))
    assert(!read.contains("l_extendedprice") && !read.contains("l_comment"),
      s"pruned columns leaked into the scan: $read")
  }

  test("fact filters are pushed to the parquet scan") {
    val p = plan(RelationalQueries.shippingPriority(spark, Sf))
    assert(p.contains("PushedFilters: [IsNotNull(o_orderdate), LessThan(o_orderdate") ||
      p.contains("LessThan(o_orderdate"), p)
    assert(p.contains("GreaterThan(l_shipdate"), p)
  }

  test("top-1 plans as TakeOrderedAndProject, not a global sort") {
    val p = plan(CoreQueries.top1ByValue(spark, Sf))
    assert(p.contains("TakeOrderedAndProject"), p)
    assert(!p.contains("Sort ["), s"global sort should not appear:\n$p")
  }

  test("dimension joins broadcast; fact-fact joins sort-merge") {
    val p = plan(RelationalQueries.localSupplierVolume(spark, Sf))
    assert(p.contains("BroadcastHashJoin"), p) // nation/region/supplier
    assert(p.contains("SortMergeJoin"), p) // customer⋈orders, orders⋈lineitem
  }

  test("grouped aggregation is partial (map-side) before the shuffle") {
    val p = plan(CoreQueries.sumByDay(spark, Sf))
    val firstAgg = p.indexOf("HashAggregate")
    val exchange = p.indexOf("Exchange")
    assert(firstAgg >= 0 && exchange >= 0)
    // final agg above the exchange, partial agg below it
    assert(p.indexOf("HashAggregate", exchange) > exchange,
      s"expected a partial aggregate below the exchange:\n$p")
  }

  test("LSH candidate join is an equi-join on band keys (never a cross product)") {
    val p = plan(DedupQueries.minhashPairs(spark, Sf))
    assert(p.contains("SortMergeJoin [band"), p)
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("trained-quantizer ANN probe is an equi-join on the cell key") {
    val p = plan(SimilarityQueries.annKmeans(spark, Sf))
    // the probe joins corpus to the broadcast query row on cell =
    // qcell — a BNLJ/cartesian would scan every cell per candidate
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
    assert(p.contains("BroadcastHashJoin"), p)
    CacheLife.release(spark) // annKmeans persists the quantized corpus
  }

  test("pairs-threshold join is an equi-join on block-pair cells (no NLJ, no cartesian)") {
    val p = plan(SimilarityQueries.pairsThreshold(spark, Sf))
    // the pair condition must be a hash/merge EQUI-join on (bi, bj) —
    // a BNLJ would evaluate the cosine interpreted per candidate pair,
    // and a cartesian would mean the block decomposition fell apart
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
    assert(p.contains("Join") && (p.contains("bi") && p.contains("bj")), p)
  }
}
