package graft

import org.apache.spark.sql.functions._

import graft.sources.BucketedLayout

/** Proves the scale claim, not just the result: a co-bucketed
  * orders ⋈ lineitem sort-merge join must plan WITHOUT a shuffle
  * exchange on either side.
  */
class BucketedLayoutSpec extends SparkSpec {

  test("co-bucketed fact-fact join plans with zero shuffle exchanges") {
    val o = Tables.orders(spark, Sf)
    val l = Tables.lineitem(spark, Sf)
    BucketedLayout.saveCoBucketed(
      (o, "orders_b", "o_orderkey"), (l, "lineitem_b", "l_orderkey"), buckets = 4)

    val ob = BucketedLayout.table(spark, "orders_b")
    val lb = BucketedLayout.table(spark, "lineitem_b")
    val joined = ob.join(lb.hint("merge"), ob("o_orderkey") === lb("l_orderkey"))
      .groupBy("o_orderpriority")
      .agg(count("*").as("n"))

    val plan = joined.queryExecution.executedPlan.toString
    val joinSection = plan.substring(plan.indexOf("SortMergeJoin"))
    assert(!joinSection.contains("Exchange hashpartitioning"),
      s"bucketed join must not shuffle its inputs:\n$plan")

    // same result as the unbucketed join
    val expected = o.join(l, o("o_orderkey") === l("l_orderkey"))
      .groupBy("o_orderpriority").agg(count("*").as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val got = joined.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == expected)

    spark.sql("DROP TABLE IF EXISTS orders_b")
    spark.sql("DROP TABLE IF EXISTS lineitem_b")
  }
}
