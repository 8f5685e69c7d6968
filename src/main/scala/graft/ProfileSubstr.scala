package graft

import org.apache.spark.sql.functions._

import graft.operators.SubstrDedup

/** Stage-attribution profiler for the winnowed-fingerprint builder —
  * round-11 verdict stretch #7: `build:substr.winnow_fp` was the
  * steepest 100× builder (8.02× on 10× more data) and the open
  * question was WHERE the bend lives: the per-token window map
  * (gramsOver — one md5 per token position), the trailing-window
  * selection (one doc_id-partitioned sort + running min + distinct),
  * or the anchor-recovery join.
  *
  * Prints cumulative wall seconds for the three nested prefixes of the
  * builder plan at one corpus dir; run it at two scales and compare
  * the DELTAS' ratios (each stage's own cost is the difference of
  * consecutive lines). Findings land in COVERAGE.md's scale notes.
  *
  * Usage: `runMain graft.ProfileSubstr <sfDir> [iters=3]`
  */
object ProfileSubstr {

  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val iters = args.lift(1).map(_.toInt).getOrElse(3)
    val spark = Sessions.local()
    try {
      def grams = SubstrDedup.gramsOver(
        Tables.spread(spark, Tables.documents(spark, dir)
          .select(col("doc_id"), col("text"))))
      def timed(name: String)(f: => Long): Unit = {
        val ts = (1 to iters).map { _ =>
          val t0 = System.nanoTime()
          val n = f
          ((System.nanoTime() - t0) / 1e9, n)
        }
        val med = ts.map(_._1).sorted.apply(iters / 2)
        println(f"[profile] $name%-18s $med%8.2f s  (${ts.head._2}%,d rows)")
      }
      timed("grams")(grams.count())
      timed("+select")(SubstrDedup.winnowSelected(grams).count())
      timed("+anchor_join")(SubstrDedup.winnowFpOver(grams).count())
    } finally { CacheLife.release(spark); spark.stop() }
  }
}
