package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.sources.{DedupLayout, VectorLayout}

/** The store fsck's contract: a freshly built root is clean, every
  * tolerated-debris state reads as `warn` with its reclaimer named,
  * and each view- or guard-breaking corruption reads as `fail` — in
  * particular the stale-sidecar and lost-fold states that would
  * otherwise corrupt silently.
  */
class DoctorSpec extends SparkSpec {

  private lazy val root: String = {
    val r = Files.createTempDirectory("graft-doctor").toString
    val docs = Tables.documents(spark, Sf).select(col("doc_id"), col("text"))
    DedupLayout.materialize(spark, docs, StoreBuild.dedupLayoutDir(r))
    sources.TextLayout.materialize(spark, docs, StoreBuild.textLayoutDir(r))
    VectorLayout.materialize(spark, Sf, StoreBuild.vectorLayoutDir(r))
    r
  }

  private def fails(rows: Seq[(String, String, String, String)]) =
    rows.filter(_._3 == "fail")

  test("a freshly built root reports zero failures across all families") {
    val rows = Doctor.check(spark, root)
    assert(fails(rows).isEmpty, s"unexpected failures: ${fails(rows)}")
    for (fam <- Seq("dedup", "text", "vectors"))
      assert(rows.exists(_._1 == fam), s"family $fam missing from the report")
    assert(rows.exists(r => r._1 == "dedup" && r._2 == "authority" && r._3 == "ok"))
    assert(rows.exists(r => r._1 == "dedup" && r._2 == "labels" && r._3 == "ok"))
  }

  test("a crashed compaction stage dir is a warn naming its reclaimer") {
    val junk = new java.io.File(
      StoreBuild.textLayoutDir(root) + "/tokens/.compact-junk")
    assert(junk.mkdirs())
    try {
      val rows = Doctor.check(spark, root)
      val w = rows.find(r => r._1 == "text" && r._2 == "tokens.stage")
      assert(w.exists(_._3 == "warn"), s"expected a stage warn, got $rows")
      assert(w.exists(_._4.contains("sweep")), "the warn must name the reclaimer")
      assert(fails(rows).isEmpty, "debris must not read as corruption")
    } finally { junk.delete(); () }
  }

  test("an id-authority record ahead of the log is a FAILURE, not a warning") {
    val stale = new java.io.File(
      StoreBuild.dedupLayoutDir(root) + "/_id_bloom/bloom-99")
    assert(stale.createNewFile())
    try {
      val rows = Doctor.check(spark, root)
      assert(rows.exists(r => r._1 == "dedup" && r._2 == "authority" &&
        r._3 == "fail" && r._4.contains("AHEAD")),
        s"stale sidecar must fail: ${rows.filter(_._1 == "dedup")}")
    } finally { stale.delete(); () }
  }

  test("versioned lifecycle: orphan version warns, dangling pointer fails") {
    val vroot = Files.createTempDirectory("graft-doctor-v").toString
    assert(new java.io.File(vroot + "/v1").mkdirs())
    assert(new java.io.File(vroot + "/_CURRENT_v1").createNewFile())
    assert(VectorLayout.fsck(spark, vroot).forall(_._2 != "fail"),
      "a pointer naming a present dir is healthy")
    // a crash between rename and pointer leaves v2 unpublished: warn
    assert(new java.io.File(vroot + "/v2").mkdirs())
    val warned = VectorLayout.fsck(spark, vroot)
    assert(warned.exists(r => r._1 == "version" && r._2 == "warn" &&
      r._3.contains("unpublished")))
    assert(!warned.exists(_._2 == "fail"))
    // a pointer naming a missing dir breaks every probe: fail
    assert(new java.io.File(vroot + "/_CURRENT_v3").createNewFile())
    val broken = VectorLayout.fsck(spark, vroot)
    assert(broken.exists(r => r._1 == "version" && r._2 == "fail" &&
      r._3.contains("missing dir")))
  }

  test("a published marker whose folded partition is lost is a failure") {
    import spark.implicits._
    val dedupRoot = StoreBuild.dedupLayoutDir(root)
    // a base-only store folds nothing (by design) — append one real
    // batch so the compact below publishes a marker + generation
    DedupLayout.append(spark,
      Seq((900001L, "doctor spec arrival one"),
        (900002L, "doctor spec arrival two")).toDF("doc_id", "text"),
      dedupRoot, batchId = 1L)
    DedupLayout.compact(spark, dedupRoot)
    val clean = Doctor.check(spark, root)
    assert(fails(clean).isEmpty, s"compacted store must be clean: ${fails(clean)}")
    // destroy the folded generation partition under pairs (gen 1 = -2)
    val gen = new java.io.File(dedupRoot + "/pairs/__batch_id=-2")
    assert(gen.isDirectory, "expected the generation partition on disk")
    def rm(f: java.io.File): Unit = {
      Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
    }
    rm(gen)
    val rows = Doctor.check(spark, root)
    assert(rows.exists(r => r._1 == "dedup" && r._2 == "pairs.generation" &&
      r._3 == "fail" && r._4.contains("unreadable")),
      s"lost fold must fail: ${rows.filter(_._1 == "dedup")}")
  }
}
