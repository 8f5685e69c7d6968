package graft

import graft.operators.{DedupQueries, SimilarityQueries, SubstrDedup, TextQueries}

/** Cold-build profiler for named index builders at one corpus dir —
  * the adjudication tool for cross-round BUILDER comparisons: a
  * builder inside the full Bench run can accidentally measure warm
  * (an earlier pass's cache blocks not yet evicted after a
  * non-blocking unpersist), which published a physically impossible
  * 100×-data-in-4.5×-time line in one round's record. This main runs
  * each named builder in a fresh-released session state, so the
  * printed time is the honest cold cost.
  *
  * Usage: `runMain graft.ProfileBuilders <dir> <name1,name2,...> [iters]`
  */
object ProfileBuilders {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val names = args(1).split(',').toSet
    val iters = args.lift(2).map(_.toInt).getOrElse(1)
    val spark = Sessions.local()
    try {
      val builders = (DedupQueries.indexBuilders(spark, dir) ++
        SubstrDedup.indexBuilders(spark, dir) ++
        SimilarityQueries.indexBuilders(spark, dir) ++
        TextQueries.indexBuilders(spark, dir))
        .filter(b => names.contains(b._1))
      require(builders.nonEmpty, s"no builder matches $names")
      (1 to iters).foreach { i =>
        builders.foreach { case (n, f) =>
          CacheLife.release(spark)
          val t0 = System.nanoTime()
          f()
          println(f"[pbuild] iter$i $n%-24s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
        }
      }
    } finally { CacheLife.release(spark); spark.stop() }
  }
}
