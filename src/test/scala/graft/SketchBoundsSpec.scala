package graft

import graft.operators.RelationalQueries
import org.apache.spark.sql.functions._

/** Error-bound verification for the two sketch queries (round-2 judge
  * task #2): `rel_approx_distinct` / `rel_approx_quantiles` can never
  * hash-match a DuckDB oracle — HLL register layouts and KLL compaction
  * differ across engines — so the correct contract is a BOUND against
  * the exact companions that already live in the registry.
  *
  * Bounds chosen from the published guarantees:
  *   - approx_count_distinct defaults to rsd = 5% (HLL++ standard
  *     deviation); we assert |approx − exact| / exact ≤ 5%, i.e. one
  *     sigma — comfortably met at these cardinalities in practice.
  *   - percentile_approx(…, accuracy=1000) guarantees rank error
  *     ≤ n/1000; we assert the approximate median falls between the
  *     exact (0.5 − n/1000·n) and (0.5 + …) rank brackets, loosened to
  *     the exact p45..p55 values — far wider than the guarantee, tight
  *     enough to catch a broken sketch.
  */
class SketchBoundsSpec extends SparkSpec {

  test("approx_count_distinct within 5% of exact per group") {
    val approx = RelationalQueries.queries("rel_approx_distinct")(spark, Sf)
      .select(col("l_returnflag"), col("approx_supps"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = RelationalQueries.queries("rel_distinct_agg")(spark, Sf)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(approx.keySet === exact.keySet)
    exact.foreach { case (flag, ex) =>
      val ap = approx(flag)
      val rel = math.abs(ap - ex).toDouble / ex
      assert(rel <= 0.05,
        s"group $flag: approx=$ap exact=$ex relative error $rel > 5%")
    }
  }

  test("percentile_approx median lands inside the exact p45..p55 bracket per group") {
    val approx = RelationalQueries.queries("rel_approx_quantiles")(spark, Sf)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val brackets = Tables.lineitem(spark, Sf)
      .groupBy(col("l_returnflag"))
      .agg(expr("percentile(l_quantity, 0.45)").as("lo"),
        expr("percentile(l_quantity, 0.55)").as("hi"))
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    assert(approx.keySet === brackets.keySet)
    brackets.foreach { case (flag, (lo, hi)) =>
      val ap = approx(flag)
      assert(ap >= lo && ap <= hi,
        s"group $flag: approx median $ap outside exact p45..p55 bracket [$lo, $hi]")
    }
  }

  test("approx quantile rank sanity: fraction of rows at-or-below approx median within [0.3, 0.7]") {
    val approx = RelationalQueries.queries("rel_approx_quantiles")(spark, Sf)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    approx.foreach { case (flag, med) =>
      val grp = Tables.lineitem(spark, Sf).filter(col("l_returnflag") === flag)
      val n = grp.count().toDouble
      val below = grp.filter(col("l_quantity") <= med).count().toDouble
      val frac = below / n
      // percentile_approx guarantees rank error ≤ 1/accuracy = 0.1%;
      // l_quantity is heavily tied (integer-valued), so the fraction at
      // or below the returned value can legitimately overshoot — assert
      // the generous ±20% rank window that still catches a broken sketch
      assert(frac >= 0.3 && frac <= 0.7,
        s"group $flag: approx median $med sits at rank fraction $frac, outside [0.3, 0.7]")
    }
  }
}
