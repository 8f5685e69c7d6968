package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.operators.{DedupQueries, SimilarityQueries}

/** The up-corpus generator's contract: copies are self-consistent
  * worlds (joins never cross them) AND similarity-neutral (pair mining
  * on N copies finds exactly N× the base pairs, all within-copy) — the
  * property that justifies running the dedup/LSH surface in the bench's
  * upward decade at all.
  */
class ScaleUpSpec extends SparkSpec {

  private val Copies = 3
  private lazy val up: String = {
    val dst = Files.createTempDirectory("graft-scaleup").toString
    ScaleUp.build(spark, Sf, dst, Copies)
    dst
  }

  private def copyOf(c: String) = floor(col(c) / ScaleUp.CopyOffset)

  test("row counts scale ×N; dimensions stay fixed") {
    def n(dir: String, t: String) = spark.read.parquet(s"$dir/$t.parquet").count()
    for (t <- Seq("customer", "orders", "lineitem", "events", "documents", "embeddings"))
      assert(n(up, t) === Copies * n(Sf, t), s"$t must replicate ×$Copies")
    for (t <- Seq("region", "nation"))
      assert(n(up, t) === n(Sf, t), s"$t is a fixed dimension")
  }

  test("foreign keys stay within their copy: orders⋈customer scales exactly ×N") {
    def joined(dir: String) =
      spark.read.parquet(s"$dir/orders.parquet")
        .join(spark.read.parquet(s"$dir/customer.parquet"),
          col("o_custkey") === col("c_custkey")).count()
    assert(joined(up) === Copies * joined(Sf))
  }

  test("alphabet rotation preserves length (n_chars stays valid) and token counts") {
    val bad = spark.read.parquet(s"$up/documents.parquet")
      .filter(length(col("text")) =!= col("n_chars")).count()
    assert(bad === 0L, "translate must preserve byte length")
    // token count per doc_id-mod-offset is identical across copies
    val tok = spark.read.parquet(s"$up/documents.parquet")
      .select(pmod(col("doc_id"), lit(ScaleUp.CopyOffset)).as("base_id"),
        size(split(col("text"), "\\s+")).as("n_tok"))
      .groupBy("base_id").agg(countDistinct("n_tok").as("variants"))
      .filter(col("variants") =!= 1).count()
    assert(tok === 0L, "every copy of a doc must tokenize to the same count")
  }

  /** LSH candidates are hash-dependent: a rotated copy re-rolls its
    * minhash values, so per-copy candidate recall varies statistically
    * around the base corpus' — what the transform GUARANTEES is that no
    * candidate crosses copies (disjoint shingle sets) and that copy 0,
    * being unrotated, reproduces the base pipeline bit-for-bit. Total
    * volume is pinned loosely (the structure is the same per copy).
    */
  private def assertBandedPairs(name: String): Unit = {
    val base = DedupQueries.queries(name)(spark, Sf).count()
    val upPairs = DedupQueries.queries(name)(spark, up)
    val crossing = upPairs.filter(copyOf("doc_a") =!= copyOf("doc_b")).count()
    assert(crossing === 0L, s"$name: no candidate pair may cross copies")
    val copy0 = upPairs.filter(copyOf("doc_a") === 0 && copyOf("doc_b") === 0).count()
    assert(copy0 === base, s"$name: copy 0 must reproduce the base pipeline exactly")
    val total = upPairs.count()
    assert(total >= (2 * Copies * base) / 3 && total <= (4 * Copies * base) / 3,
      s"$name: per-copy recall should track the base corpus (got $total vs ~${Copies * base})")
  }

  test("minhash pair mining stays within-copy; copy 0 reproduces the base") {
    assertBandedPairs("dedup_minhash_pairs")
  }

  test("chargram pair mining stays within-copy; copy 0 reproduces the base") {
    assertBandedPairs("dedup_chargram_pairs")
  }

  test("exact dedup groups scale ×N and never merge across copies") {
    val base = DedupQueries.queries("dedup_exact")(spark, Sf).count()
    assert(DedupQueries.queries("dedup_exact")(spark, up).count() === Copies * base)
  }

  /** The exact kernel is rotation-invariant WITHIN a copy (orthogonal
    * transform), so same-copy pairs scale exactly ×N. ACROSS copies two
    * things must hold: a vector never pairs with its own rotated
    * replica (the aliasing the transform exists to prevent), and
    * different-vector cross pairs appear at no more than the corpus'
    * own random-pair rate — they are real tail statistics a genuinely
    * larger corpus would also have, not a replication artifact.
    */
  test("embedding rotation: within-copy pairs scale ×N; no replica aliasing") {
    val base = SimilarityQueries.queries("sim_pairs_threshold")(spark, Sf).count()
    val upPairs = SimilarityQueries.queries("sim_pairs_threshold")(spark, up)
    val within = upPairs.filter(copyOf("vec_a") === copyOf("vec_b")).count()
    assert(within === Copies * base,
      "orthogonal rotation must preserve every within-copy cosine")
    val aliased = upPairs
      .filter(copyOf("vec_a") =!= copyOf("vec_b"))
      .filter(pmod(col("vec_a"), lit(ScaleUp.CopyOffset))
        === pmod(col("vec_b"), lit(ScaleUp.CopyOffset))).count()
    assert(aliased === 0L, "a vector must never pair with its rotated replica")
    val crossing = upPairs.filter(copyOf("vec_a") =!= copyOf("vec_b")).count()
    val n = spark.read.parquet(s"$Sf/embeddings.parquet").count()
    val crossRate = crossing.toDouble / (Copies * (Copies - 1) / 2 * n * n)
    val baseRate = base.toDouble / (n * (n - 1) / 2)
    assert(crossRate <= baseRate,
      f"cross-copy pair rate $crossRate%.6f must not exceed the corpus' own pair rate $baseRate%.6f")
  }

  test("neutrality verifier measures under the pair threshold on this corpus") {
    val worst = ScaleUp.verifyEmbeddingNeutrality(
      spark, Sf, Copies, SimilarityQueries.PairThreshold)
    assert(worst < SimilarityQueries.PairThreshold)
    assert(worst > 0.0, "a zero max would mean the probe measured nothing")
  }

  test("the verifier refuses a corpus whose replicas alias (threshold made loud)") {
    val e = intercept[IllegalArgumentException] {
      // any real corpus has SOME autocorrelation; a zero threshold must trip
      ScaleUp.verifyEmbeddingNeutrality(spark, Sf, Copies, 0.0)
    }
    assert(e.getMessage.contains("replica aliasing"))
  }
}
