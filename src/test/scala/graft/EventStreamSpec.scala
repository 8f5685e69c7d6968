package graft

import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.spark.sql.streaming.{OutputMode, Trigger}

import graft.streaming.EventStream

/** Streams-are-incremental-batch: draining the events table through the
  * file-stream source must reproduce the batch daily counts exactly.
  */
class EventStreamSpec extends SparkSpec {

  test("file-stream daily counts equal the batch aggregate after drain") {
    // file source wants a directory of files
    val dir = Files.createTempDirectory("graft-stream")
    Files.copy(Paths.get(s"$Sf/events.parquet"),
      dir.resolve("events.parquet"), StandardCopyOption.REPLACE_EXISTING)

    val agg = EventStream.countByDay(EventStream.read(spark, dir.toString))
    val q = agg.writeStream
      .format("memory").queryName("stream_counts")
      .outputMode(OutputMode.Complete)
      .trigger(Trigger.AvailableNow())
      .start()
    val streamed =
      try {
        assert(q.awaitTermination(120000), "stream did not drain in 120s")
        spark.table("stream_counts").collect()
          .map(r => r.getDate(0).toString -> r.getLong(1)).toMap
      } finally q.stop()

    val batch = CoreQueriesBatchCounts()
    assert(streamed == batch, s"stream $streamed vs batch $batch")
    assert(streamed.values.sum == Tables.events(spark, Sf).count())
  }

  private def CoreQueriesBatchCounts(): Map[String, Long] =
    graft.operators.CoreQueries.countByDay(spark, Sf).collect()
      .map(r => r.getDate(0).toString -> r.getLong(1)).toMap

  test("session_window sessionization equals the batch gap sessionize after drain") {
    val dir = Files.createTempDirectory("graft-sess")
    Files.copy(Paths.get(s"$Sf/events.parquet"),
      dir.resolve("events.parquet"), StandardCopyOption.REPLACE_EXISTING)

    val q = EventStream.sessionize(EventStream.read(spark, dir.toString))
      .writeStream
      .format("memory").queryName("stream_sessions")
      .outputMode(OutputMode.Complete)
      .trigger(Trigger.AvailableNow())
      .start()
    val streamed =
      try {
        assert(q.awaitTermination(120000), "stream did not drain in 120s")
        spark.table("stream_sessions").collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      } finally q.stop()

    // batch ordinals don't exist stream-side — compare the full row set
    // on the shared identity (user, start) with measures attached
    val batch = graft.operators.TemporalQueries.sessionize(spark, Sf).collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(streamed.sorted.toSeq == batch.sorted.toSeq,
      s"stream sessions (${streamed.length}) != batch sessions (${batch.length})")
  }

  test("stateful streaming as-of join equals the batch union-window as-of after drain") {
    val dir = Files.createTempDirectory("graft-asof")
    Files.copy(Paths.get(s"$Sf/events.parquet"),
      dir.resolve("events.parquet"), StandardCopyOption.REPLACE_EXISTING)

    val q = EventStream.asofJoin(EventStream.read(spark, dir.toString))
      .writeStream
      .format("memory").queryName("stream_asof")
      .outputMode(OutputMode.Append)
      .trigger(Trigger.AvailableNow())
      .start()
    val streamed =
      try {
        assert(q.awaitTermination(120000), "stream did not drain in 120s")
        spark.table("stream_asof").collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
            Option(r.get(3)).map(_.asInstanceOf[Long]),
            Option(r.get(4)).map(_.asInstanceOf[Long])))
      } finally q.stop()

    val batch = graft.operators.TemporalQueries.asofJoin(spark, Sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        Option(r.get(3)).map(_.asInstanceOf[Long]),
        Option(r.get(4)).map(_.asInstanceOf[Long])))
    assert(streamed.sortBy(_._1).toSeq == batch.sortBy(_._1).toSeq,
      s"stream as-of (${streamed.length}) != batch as-of (${batch.length})")
  }
}
