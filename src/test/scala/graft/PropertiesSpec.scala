package graft

import org.apache.spark.sql.functions._

import graft.operators.Exact

/** Property-style tests (seeded generators) for the two cross-engine
  * semantic traps SURVEY §5.2 flags:
  *   - F4 round-cast: `round(x).cast("int")` must round (HALF_UP), not
  *     truncate, across sign/magnitude ranges;
  *   - Exact.dsum: decimal-accumulated sums must be IDENTICAL under any
  *     partitioning (plain double sums are partition-order dependent —
  *     the reason Exact exists).
  */
class PropertiesSpec extends SparkSpec {
  import spark.implicits._

  private val rnd = new scala.util.Random(42)

  test("round-cast property: matches BigDecimal HALF_UP for 10k random doubles") {
    val xs = Seq.fill(10000)((rnd.nextDouble() - 0.5) * 200000)
    val got = xs.toDF("x").select(round(col("x")).cast("int").as("i"))
      .collect().map(_.getInt(0))
    val want = xs.map(x => java.math.BigDecimal.valueOf(x)
      .setScale(0, java.math.RoundingMode.HALF_UP).intValueExact())
    got.zip(want).zip(xs).foreach { case ((g, w), x) =>
      assert(g == w, s"round($x): got $g want $w")
    }
    // and the trap itself: cast-without-round truncates
    val truncated = xs.toDF("x").select(col("x").cast("int")).collect().map(_.getInt(0))
    assert(truncated.zip(want).exists { case (t, w) => t != w },
      "bare cast should disagree with rounding somewhere in 10k samples")
  }

  test("dsum property: identical result under 1, 7, and 32 partitions") {
    val xs = Seq.fill(20000)(BigDecimal(rnd.nextInt(2000000)) / 100)
      .map(_.toDouble)
    val results = Seq(1, 7, 32).map { p =>
      xs.toDF("x").repartition(p).agg(Exact.dsum(col("x"))).collect().head.getDouble(0)
    }
    assert(results.distinct.size == 1, s"partitioning changed the sum: $results")
    // exactness: equals the rational-arithmetic reference
    val exact = (xs.map(x => BigDecimal(x)).sum).toDouble
    assert(results.head == exact)
  }

  test("davg property: stable under repartitioning") {
    val xs = Seq.fill(5000)(BigDecimal(rnd.nextInt(100000)) / 100).map(_.toDouble)
    val results = Seq(1, 13).map { p =>
      xs.toDF("x").repartition(p).agg(Exact.davg(col("x"))).collect().head.getDouble(0)
    }
    assert(results.distinct.size == 1)
  }

  test("mdBucket property: in range and equal to an independent md5 reference") {
    // every hash-keyed behavior (sampling, splits, mix rates, shards)
    // rides this one expression — pin it against a from-scratch JVM
    // computation of the same spec: first 40 md5 bits of the string,
    // mod m
    val keys = Seq.fill(2000)(rnd.alphanumeric.take(rnd.nextInt(20) + 1).mkString)
    val m = 97
    val got = keys.toDF("k")
      .select(graft.functions.Buckets.mdBucket(col("k"), m).as("b"))
      .collect().map(_.getLong(0))
    val md = java.security.MessageDigest.getInstance("MD5")
    val want = keys.map { k =>
      val hex = md.digest(k.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.take(10), 16) % m
    }
    got.zip(want).zip(keys).foreach { case ((g, w), k) =>
      assert(g == w, s"mdBucket('$k'): got $g want $w")
    }
    assert(got.forall(b => b >= 0 && b < m))
  }
}
