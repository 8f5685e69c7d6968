package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.execution.FormattedMode

/** Dump `.explain("formatted")` of named registered queries to one file
  * per query — the optimization rounds' before/after plan evidence
  * (`plans/r19/<query>_<tag>.txt`).
  *
  * `runMain graft.DumpPlansTo <outDir> <tag> <name,name,...> [sfDir]`
  */
object DumpPlansTo {
  def main(args: Array[String]): Unit = {
    val outDir = Paths.get(args(0))
    val tag = args(1)
    val names = args(2).split(',').toSeq
    val dir = args.lift(3).getOrElse("/root/testdata/sf0.01")
    Files.createDirectories(outDir)
    val s = Sessions.local()
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
