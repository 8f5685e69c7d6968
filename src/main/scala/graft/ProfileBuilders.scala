package graft

import graft.operators.{DedupQueries, SimilarityQueries, SubstrDedup, TextQueries}

/** Cold profiler for named index builders AND registered queries at
  * one corpus dir — the adjudication tool for cross-round and
  * cross-decade comparisons: a line inside the full Bench run can
  * accidentally measure warm (an earlier pass's cache blocks not yet
  * evicted after a non-blocking unpersist), which published a
  * physically impossible 100×-data-in-4.5×-time builder line in one
  * round's record, and deflated sf1-up query denominators inflated
  * ~20 second-decade ratios past 10 in another (round-12 verdict
  * item #2). Protocols:
  *
  *   - BUILDERS: every iteration runs from a fresh-released session
  *     state — each printed time is the honest cold build cost;
  *   - QUERIES: released once per query, then `max(iters, 2)` runs in
  *     place — iteration 1 is the cold cost INCLUDING the cache
  *     population the query rides, iteration 2+ the steady state the
  *     bench medians correspond to. The pair brackets any published
  *     ratio: a genuine plan bend shows in BOTH lines, a
  *     warm-denominator artifact only in the first.
  *
  * Usage: `runMain graft.ProfileBuilders <dir> <name1,name2,...> [iters]`
  * (names may mix builder names and registered query names).
  */
object ProfileBuilders {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val names = args(1).split(',').toSet
    val iters = args.lift(2).map(_.toInt).getOrElse(1)
    // optional 4th arg `conf:k=v,k=v` — the Verify/VerifyStream
    // discipline, so knobbed configurations (scaled K, assignment mode)
    // profile through the same entry; malformed input refuses loudly
    require(args.lift(3).forall(_.startsWith("conf:")),
      s"the 4th arg must be conf:k=v,k=v — got '${args.lift(3).getOrElse("")}'")
    val confs: Seq[(String, String)] = args.lift(3).toSeq
      .flatMap(_.stripPrefix("conf:").split(',').toSeq)
      .map { kv =>
        kv.split("=", 2) match {
          case Array(k, v) => (k, v)
          case _ => sys.error(s"malformed conf token '$kv' — expected key=value")
        }
      }
    val spark = Sessions.local()
    confs.foreach { case (k, v) =>
      println(s"[pbuild] conf $k=$v")
      spark.conf.set(k, v)
    }
    try {
      val builders = (DedupQueries.indexBuilders(spark, dir) ++
        SubstrDedup.indexBuilders(spark, dir) ++
        SimilarityQueries.indexBuilders(spark, dir) ++
        TextQueries.indexBuilders(spark, dir))
        .filter(b => names.contains(b._1))
      val queries = SparkEntry.queries.toSeq.sortBy(_._1)
        .filter(q => names.contains(q._1))
      require(builders.nonEmpty || queries.nonEmpty,
        s"no builder or registered query matches $names")
      (1 to iters).foreach { i =>
        builders.foreach { case (n, f) =>
          CacheLife.release(spark)
          val t0 = System.nanoTime()
          f()
          println(f"[pbuild] iter$i $n%-24s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
        }
      }
      queries.foreach { case (n, f) =>
        CacheLife.release(spark)
        (1 to math.max(iters, 2)).foreach { i =>
          val t0 = System.nanoTime()
          f(spark, dir).count()
          println(f"[pquery] iter$i $n%-24s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
        }
      }
    } finally { CacheLife.release(spark); spark.stop() }
  }
}
