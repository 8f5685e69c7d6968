package graft

import java.nio.file.{Files, Paths}

import org.scalatest.funsuite.AnyFunSuite

/** Bench harness contracts that need no SparkSession: the up-corpus
  * default resolution (round-11 verdict stretch #6 — a stray
  * `testdata_up` in an arbitrary CWD must not silently win) and the
  * contention-telemetry sampler (round-11 item #3).
  */
class BenchSpec extends AnyFunSuite {

  test("a CWD that is not a repo root offers ONLY the canonical absolute corpus") {
    val cwd = Files.createTempDirectory("graft-bench-cwd")
    // a stray testdata_up/sf1 in this non-repo CWD must NOT be offered
    Files.createDirectories(cwd.resolve("testdata_up").resolve("sf1"))
    assert(Bench.upCorpusCandidates("sf1", cwd) === Seq("/root/repo/testdata_up/sf1"))
  }

  test("a repo-root CWD (build.sbt present) offers its own corpus first, fallback second") {
    val cwd = Files.createTempDirectory("graft-bench-repo")
    Files.writeString(cwd.resolve("build.sbt"), "// marker")
    assert(Bench.upCorpusCandidates("sf10", cwd) === Seq(
      cwd.resolve("testdata_up").resolve("sf10").toString,
      "/root/repo/testdata_up/sf10"))
  }

  test("the real repo root resolves to exactly its own testdata_up then the fallback") {
    val repo = Paths.get("/root/repo")
    assert(Bench.upCorpusCandidates("sf1", repo) === Seq(
      "/root/repo/testdata_up/sf1", "/root/repo/testdata_up/sf1"))
  }

  test("loadAvg returns a finite non-negative sample on this host") {
    val l = Bench.loadAvg()
    assert(!l.isNaN && l >= 0.0 && l < 100000.0, s"implausible loadavg $l")
  }
}
