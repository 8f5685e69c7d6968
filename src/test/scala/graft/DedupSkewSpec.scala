package graft

import org.apache.spark.sql.functions._

import graft.functions.{TextFunctions => T}
import graft.operators.DedupQueries

/** Adversarial skew: a corpus where hundreds of IDENTICAL documents
  * share every band key — the hot bucket the plain LSH self-join would
  * grind through as one n²/2 task. The capped join must produce the
  * exact same pairs while keeping every join-group side ≤ cap rows.
  */
class DedupSkewSpec extends SparkSpec {
  import spark.implicits._

  private val N = 120
  private val Cap = 16

  private lazy val bands = {
    val docs = (0L until N.toLong).map(i =>
      (i, "alpha beta gamma delta epsilon zeta eta theta iota kappa")) ++
      Seq((900L, "completely unrelated wording sharing no shingles with the clones"))
    DedupQueries.lshBandsOver(
      docs.toDF("doc_id", "text")
        .select(col("doc_id"),
          call_function("graft_shingles", T.tokens(col("text")), lit(3)).as("sh")))
  }

  test("capped pairs are set-identical to the uncapped self-join") {
    val capped = DedupQueries.bandPairsCapped(bands, Cap).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val uncapped = DedupQueries.bandPairsCapped(bands, 1 << 30).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(capped == uncapped)
    // all clones pair with each other, the outlier pairs with nobody
    assert(capped.size == N * (N - 1) / 2)
    assert(capped.forall { case (a, b) => a < b && a != 900L && b != 900L })
  }

  test("no join-group side exceeds the bucket cap") {
    // the hot bucket really is hot: every band key is shared by all N
    val biggest = bands.groupBy("band", "key").count()
      .agg(max("count")).collect().head.getLong(0)
    assert(biggest == N.toLong, "adversarial corpus must produce a hot bucket")
    val (aSide, bSide) = DedupQueries.cellSides(bands, Cap)
    Seq(aSide, bSide).foreach { side =>
      val worst = side.groupBy("band", "key", "bi", "bj").count()
        .agg(max("count")).collect().head.getLong(0)
      assert(worst <= Cap.toLong,
        s"a join group side has $worst rows > cap $Cap")
    }
  }

  test("capped candidate join still plans as an equi-join") {
    val p = DedupQueries.bandPairsCapped(bands, Cap)
      .queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"), p)
    assert(p.contains("SortMergeJoin [band"), p)
  }
}
