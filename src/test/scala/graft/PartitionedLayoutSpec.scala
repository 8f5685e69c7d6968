package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.sources.PartitionedLayout

class PartitionedLayoutSpec extends SparkSpec {

  test("day filter on the partitioned layout is partition pruning, not a scan filter") {
    val out = Files.createTempDirectory("graft-events").toString + "/events"
    PartitionedLayout.materializeEvents(spark, Sf, out)

    val day = PartitionedLayout.eventsOn(spark, out, "2024-01-15")
    val plan = day.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters"), plan)
    assert(plan.contains("period_date"), plan)

    // result parity with the flat-file formulation
    val flat = Tables.events(spark, Sf)
      .filter(to_date(col("ts")) === lit("2024-01-15").cast("date")).count()
    assert(day.count() == flat)

    // physical layout: one directory per day
    val dirs = new java.io.File(out).listFiles().filter(_.isDirectory)
      .map(_.getName).filter(_.startsWith("period_date="))
    assert(dirs.length >= 28, s"expected ~30 day partitions, got ${dirs.length}")
  }
}
