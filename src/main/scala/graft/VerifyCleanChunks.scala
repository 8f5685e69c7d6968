package graft
import org.apache.spark.sql.SparkSession

import graft.operators.SubstrDedup

/** One-JVM dump of ALL [[operators.SubstrDedup.CleanChunkBuckets]] doc
  * buckets of `dedup_substr_clean_chunk` — the Spark side of the
  * full-corpus string-granularity oracle at 100× (round-15 verdict #2).
  *
  * `tools/run_r16_cleanfull.sh`'s one-bucket-per-JVM spelling re-derives
  * the corpus-wide span set from scratch 20 times (the spans cache —
  * `substr.spans:<dir>` — lives and dies with the session): at the 100×
  * corpus that is ~20× the pass's real work, since the per-bucket
  * excision re-join is the cheap 1/20-restricted tail. This main keeps
  * ONE session, so the first bucket pays the span derivation and the
  * other 19 ride the CacheLife materialization; each bucket lands in
  * `<outRoot>/b<k>/` as a self-contained [[Verify]]-shaped outdir (the
  * query parquet + a 1-entry oracle_sql.json regenerated under that
  * bucket's live conf), so `tools/check_oracle_chunked.py` gates each
  * one unchanged.
  *
  * Usage: runMain graft.VerifyCleanChunks <sfDir> <outRoot> [buckets]
  * `buckets` is a comma list (default: all 20) — the resume path after
  * a killed run: pass only the buckets whose rec files are missing.
  */
object VerifyCleanChunks {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: VerifyCleanChunks <sfDir> <outRoot> [buckets]")
    val (sfDir, outRoot) = (args(0), args(1))
    val buckets = args.lift(2)
      .map(_.split(',').toSeq.map(_.trim.toInt))
      .getOrElse(0 until SubstrDedup.CleanChunkBuckets)
    buckets.foreach(b => require(
      b >= 0 && b < SubstrDedup.CleanChunkBuckets, s"bucket $b out of range"))
    val spark = Sessions.local()
    try {
      buckets.foreach { b =>
        spark.conf.set(SubstrDedup.CleanChunkKey, b.toString)
        val outDir = s"$outRoot/b$b"
        new java.io.File(outDir).mkdirs()
        val t0 = System.nanoTime()
        SubstrDedup.cleanChunk(spark, sfDir).coalesce(1)
          .write.mode("overwrite").parquet(s"$outDir/dedup_substr_clean_chunk")
        // the oracle string embeds the LIVE bucket (same conf the frame
        // above ran under) — regenerate inside the loop, never before it
        Verify.writeOracleJson(s"$outDir/oracle_sql.json",
          Map("dedup_substr_clean_chunk" ->
            SubstrDedup.oracle("dedup_substr_clean_chunk")))
        println(f"[cleanchunks] bucket $b dumped in ${(System.nanoTime() - t0) / 1e9}%.1fs")
      }
    } finally {
      CacheLife.release(spark)
      spark.stop()
    }
  }
}
