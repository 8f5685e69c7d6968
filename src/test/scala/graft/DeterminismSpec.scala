package graft

/** Engine-wide partition-order independence: EVERY registered query
  * must produce the identical row multiset under different shuffle
  * partitionings. This is the property the repo's exactness designs
  * exist for (decimal/integer accumulators, rounded-before-order
  * floats, deterministic tie-breaks, hash sampling) — and the failure
  * mode a single-partitioning oracle compare can coincidentally miss:
  * an order-dependent double sum can hash-match once and still flap
  * between cluster runs.
  *
  * The two sketch queries are INCLUDED since their error-contract-eval
  * rewrite: raw approximate-quantile summaries are merge-order
  * sensitive, but the registered outputs are now exact companions plus
  * in-bound booleans — the sketch's partitioning wiggle stays inside
  * the bound, so the OUTPUT is partition-order independent (and a
  * sketch wiggling OUT of bound under a repartitioning is exactly what
  * this spec should catch).
  */
class DeterminismSpec extends SparkSpec {

  test("every hash-checked query is identical under 5 vs 32 shuffle partitions") {
    val names = SparkEntry.queries.keys.toSeq.sorted
    def run(name: String, parts: Int): Seq[String] = {
      spark.conf.set("spark.sql.shuffle.partitions", parts.toString)
      try SparkEntry.queries(name)(spark, Sf).collect().map(_.toString).sorted.toSeq
      finally spark.conf.set("spark.sql.shuffle.partitions", "32")
    }
    names.foreach { name =>
      val a = run(name, 5)
      // caches built under the first partitioning must not mask a
      // repartitioning sensitivity in the probe side; release between
      CacheLife.release(spark)
      val b = run(name, 32)
      CacheLife.release(spark)
      assert(a == b,
        s"$name differs across shuffle partitionings: ${a.size} vs ${b.size} rows; " +
        s"first diff: ${a.zip(b).find { case (x, y) => x != y }.orElse(Some(("<size>", "<size>")))}")
    }
  }
}
