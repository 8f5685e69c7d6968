package graft

/** Debug utility: write registered oracle SQL strings to files WITHOUT
  * starting a SparkSession — so a new oracle can be syntax-checked in
  * DuckDB (over the tiny sf0.001 tables) before paying for a full
  * Verify dump. Usage:
  *   runMain graft.DumpOracleSql <outDir> [name1,name2,...]
  * Dumps every registered oracle when no names are given. Knob-aware
  * oracles resolve their compiled defaults here (no active session).
  */
object DumpOracleSql {
  def main(args: Array[String]): Unit = {
    val outDir = java.nio.file.Path.of(args(0))
    java.nio.file.Files.createDirectories(outDir)
    val all = SparkEntry.oracleSql
    val names =
      if (args.length > 1) args(1).split(',').toSeq else all.keys.toSeq.sorted
    names.foreach { n =>
      java.nio.file.Files.writeString(outDir.resolve(s"$n.sql"), all(n))
    }
    println(s"dumped ${names.size} oracle(s) to $outDir")
  }
}
