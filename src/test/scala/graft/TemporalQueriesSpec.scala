package graft

import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.TemporalQueries

/** Brute-force parity for the composed temporal operators: the bucketed
  * range join and the union-window as-of join must equal the O(n²)
  * driver-side definitions on the sf0.001 corpus (the DuckDB oracle at
  * sf0.01 is the scale gate; this pins the SEMANTICS to a reference
  * implementation that is obviously correct).
  */
class TemporalQueriesSpec extends SparkSpec {

  private lazy val events = Tables.events(spark, Sf)
    .select(col("event_id"), col("user_id"), col("event_type"),
      expr("ts_ns div 1000").as("ts_us"))
    .collect()
    .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))

  test("asof join equals the brute-force latest-click-at-or-before") {
    val clicks = events.filter(_._3 == "click")
    val expected = events.filter(_._3 == "error").map { case (id, u, _, ts) =>
      val mine = clicks.filter(c => c._2 == u && c._4 <= ts)
      val best = if (mine.isEmpty) None
        else Some(mine.maxBy(c => (c._4, c._1))) // latest ts, then highest id
      (id, best.map(_._1))
    }.toMap
    val got = TemporalQueries.asofJoin(spark, Sf).collect()
      .map(r => (r.getLong(0), Option(r.get(3)).map(_.asInstanceOf[Long]))).toMap
    assert(got == expected)
  }

  test("range join equals the brute-force 5-minute lookahead count") {
    val clickTs = events.filter(_._3 == "click").map(_._4)
    val expected = events.filter(_._3 == "error").map { case (id, _, _, ts) =>
      id -> clickTs.count(c => c > ts && c <= ts + TemporalQueries.RangeWindowUs).toLong
    }.toMap
    val got = TemporalQueries.rangeJoinCounts(spark, Sf).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(got == expected)
  }

  test("sessions partition each user's events and gaps only occur between sessions") {
    val sessions = TemporalQueries.sessionize(spark, Sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(sessions.map(_._3).sum == events.length.toLong,
      "every event belongs to exactly one session")
    sessions.groupBy(_._1).foreach { case (_, ss) =>
      val ordered = ss.sortBy(_._2)
      assert(ordered.map(_._2).toSeq == (1L to ss.length.toLong).toSeq,
        "session indexes are dense per user")
      ordered.sliding(2).foreach {
        case Array(a, b) =>
          assert(b._4 - a._5 >= TemporalQueries.SessionGapUs,
            "consecutive sessions must be separated by at least the gap")
        case _ =>
      }
      ordered.foreach(s => assert(s._4 <= s._5))
    }
  }
}
