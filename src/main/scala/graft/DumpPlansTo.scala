package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.execution.FormattedMode

/** Dump `.explain("formatted")` of named registered queries to one file
  * per query — the optimization rounds' before/after plan evidence
  * (`plans/r20/<query>_<tag>.txt`).
  *
  * `runMain graft.DumpPlansTo <outDir> <tag> <name,name,...> [sfDir] [warm]`
  *
  * With the 5th arg `warm`, the shared index builders run first so the
  * dumped plan is the one the bench's timed queries execute (memoized
  * stores plan as InMemoryTableScan instead of their build lineage) —
  * without it, a store-riding query's plan shows the whole build tree.
  */
object DumpPlansTo {
  def main(args: Array[String]): Unit = {
    val outDir = Paths.get(args(0))
    val tag = args(1)
    val names = args(2).split(',').toSeq
    val dir = args.lift(3).getOrElse("/root/testdata/sf0.01")
    Files.createDirectories(outDir)
    val s = Sessions.local()
    if (args.lift(4).contains("warm"))
      (operators.DedupQueries.indexBuilders(s, dir) ++
        operators.SubstrDedup.indexBuilders(s, dir) ++
        operators.SimilarityQueries.indexBuilders(s, dir) ++
        operators.TextQueries.indexBuilders(s, dir)).foreach(_._2())
    names.foreach { name =>
      SparkEntry.queries.get(name) match {
        case None => println(s"[plans] UNKNOWN query: $name")
        case Some(fn) =>
          val plan = fn(s, dir).queryExecution.explainString(FormattedMode)
          Files.writeString(outDir.resolve(s"${name}_$tag.txt"), plan)
          println(s"[plans] wrote ${name}_$tag.txt")
      }
    }
    CacheLife.release(s)
    s.stop()
  }
}
