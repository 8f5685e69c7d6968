package graft

import org.apache.spark.sql.SparkSession

import graft.sources.{DedupLayout, TextLayout, VectorLayout}

/** The scheduled MAINTENANCE job — [[StoreBuild]]'s operational twin.
  * StoreBuild lays the artifacts down once; streaming ingest
  * ([[graft.streaming.DedupStream]]/[[graft.streaming.TextStream]]/
  * [[graft.streaming.VectorStream]]) grows them batch by batch; this
  * job is everything a deployment runs BETWEEN ingests to keep them
  * healthy, in dependency order per store family:
  *
  *   - dedup: advance the cluster labels over every complete appended
  *     batch ([[DedupLayout.refreshLabels]]), then fold the batch log
  *     ([[DedupLayout.compact]] — which re-bounds the refresh to its
  *     own watermark, so running both is safe and idempotent);
  *   - text: fold the token/partials logs ([[TextLayout.compact]]);
  *   - vectors: fold the cell/batch log ([[VectorLayout.compact]]),
  *     read the drift report, and when it demands a retrain, ACT —
  *     [[VectorLayout.retrainAndSwap]] then [[VectorLayout.gcVersions]]
  *     (keeping the prior version for the swap's reader-drain grace).
  *
  * Every step is idempotent and watermark-gated, so the job can run on
  * any schedule, after any crash, with nothing to hand it but the
  * root. Quiescence contract: run between ingest drains (or bound
  * compaction with `upToBatch`/`sweepNow=false` — see
  * [[graft.sources.LogCompaction.run]]); this main assumes the
  * scheduled-slot deployment and takes the defaults.
  *
  * Usage: `runMain graft.StoreMaintain <sfDir> <storeRoot>`
  */
object StoreMaintain {

  /** Run every maintenance action; returns (action, outcome) lines. */
  def maintainAll(spark: SparkSession, sfDir: String,
                  root: String): Seq[(String, String)] = {
    spark.conf.set(CacheLife.RootKey, root)
    val dedupRoot = StoreBuild.dedupLayoutDir(root)
    val textRoot = StoreBuild.textLayoutDir(root)
    val vecRoot = StoreBuild.vectorLayoutDir(root)
    val out = Seq.newBuilder[(String, String)]

    DedupLayout.refreshLabels(spark, dedupRoot)
    out += "dedup.refresh_labels" -> "refreshed"
    out += "dedup.compact" ->
      s"watermark=${DedupLayout.compact(spark, dedupRoot)}"
    out += "text.compact" ->
      s"watermark=${TextLayout.compact(spark, textRoot)}"
    out += "sim.layout_compact" ->
      s"watermark=${VectorLayout.compact(spark, vecRoot)}"

    val drift = VectorLayout.occupancyDrift(spark, vecRoot).head
    val retrain = drift.getAs[Boolean]("retrain")
    out += "sim.layout_drift" -> s"retrain=$retrain"
    if (retrain) {
      // only meaningful on a VERSIONED root; a plain layout dir
      // (StoreBuild's default) reports the drift and leaves the swap to
      // a versioned deployment
      if (VectorLayout.currentVersion(spark, vecRoot).isDefined) {
        val v = VectorLayout.retrainAndSwap(spark, vecRoot)
        // keep = 2: the just-retired version stays for the reader-drain
        // grace window; the next maintenance run reclaims it
        val gcd = VectorLayout.gcVersions(spark, vecRoot, keep = 2)
        out += "sim.layout_retrain" -> s"swapped=v$v gc=${gcd.mkString(",")}"
      } else {
        out += "sim.layout_retrain" -> "skipped: unversioned root (run materializeVersioned to enable swaps)"
      }
    }
    out.result()
  }

  def main(args: Array[String]): Unit = {
    val (sfDir, root) = (args(0), args(1))
    val spark = Sessions.local()
    maintainAll(spark, sfDir, root).foreach { case (name, outcome) =>
      println(s"[maintain] $name: $outcome")
    }
    CacheLife.release(spark)
    spark.stop()
  }
}
