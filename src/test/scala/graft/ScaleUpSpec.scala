package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.operators.{DedupQueries, SimilarityQueries}

/** The up-corpus generator's contract: copies are self-consistent
  * worlds (joins never cross them) AND similarity-neutral — text pair
  * mining stays strictly within-copy (disjoint shingle spaces), and
  * embedding pair statistics scale the way a genuinely larger corpus
  * would (linear planted structure within copies, quadratic tail
  * across them, diagonal replica-aliasing bounded). This is the
  * property that justifies running the dedup/LSH surface in the
  * bench's upward decade at all.
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

  /** LSH candidates are hash-dependent: rotation preserves each copy's
    * Jaccard structure EXACTLY (a char bijection maps shingle sets
    * isomorphically), but realized band collisions re-roll with the
    * gram hashes, and candidate volume is bucket-combinatorics (a hot
    * band bucket of B docs contributes B²/2 pairs), so per-copy counts
    * swing well beyond sampling noise — a 3–4× drop for the dense
    * char-gram family is normal. What the transform GUARANTEES, and
    * what these asserts pin: no candidate crosses copies (disjoint
    * shingle spaces), copy 0 reproduces the base pipeline bit-for-bit,
    * and every rotated copy still mines a working candidate set.
    */
  private def assertBandedPairs(name: String): Unit = {
    val base = DedupQueries.queries(name)(spark, Sf).count()
    val upPairs = DedupQueries.queries(name)(spark, up)
    val crossing = upPairs.filter(copyOf("doc_a") =!= copyOf("doc_b")).count()
    assert(crossing === 0L, s"$name: no candidate pair may cross copies")
    val copy0 = upPairs.filter(copyOf("doc_a") === 0 && copyOf("doc_b") === 0).count()
    assert(copy0 === base, s"$name: copy 0 must reproduce the base pipeline exactly")
    (1 until Copies).foreach { k =>
      val ck = upPairs.filter(copyOf("doc_a") === k && copyOf("doc_b") === k).count()
      assert(ck > 0 && ck <= 4 * base,
        s"$name: copy $k's candidate volume $ck is implausible vs base $base")
    }
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
    * transform), so same-copy pairs scale exactly ×N. ACROSS copies:
    * the 0.4 threshold sits inside the corpus' random-cosine tail, so
    * different-vector cross pairs are REAL tail statistics a genuinely
    * larger corpus would also have (a real N× corpus grows threshold
    * pairs quadratically) — the contract is that their rate tracks the
    * corpus' own pair rate, and that diagonal replica-aliasing (a
    * vector pairing with its own rotated twin) stays a bounded
    * curiosity, not a structural artifact.
    */
  test("embedding rotation: within-copy pairs scale ×N; aliasing bounded; cross rate honest") {
    val base = SimilarityQueries.queries("sim_pairs_threshold")(spark, Sf).count()
    val upPairs = SimilarityQueries.queries("sim_pairs_threshold")(spark, up)
    val within = upPairs.filter(copyOf("vec_a") === copyOf("vec_b")).count()
    assert(within === Copies * base,
      "orthogonal rotation must preserve every within-copy cosine")
    val n = spark.read.parquet(s"$Sf/embeddings.parquet").count()
    val aliased = upPairs
      .filter(copyOf("vec_a") =!= copyOf("vec_b"))
      .filter(pmod(col("vec_a"), lit(ScaleUp.CopyOffset))
        === pmod(col("vec_b"), lit(ScaleUp.CopyOffset))).count()
    val aliasBound = (ScaleUp.MaxAliasFraction *
      (Copies * (Copies - 1) / 2) * n).toLong
    assert(aliased <= aliasBound,
      s"replica-alias pairs $aliased exceed the published bound $aliasBound")
    val crossing = upPairs.filter(copyOf("vec_a") =!= copyOf("vec_b")).count()
    val crossRate = crossing.toDouble / (Copies * (Copies - 1) / 2 * n * n)
    val baseRate = base.toDouble / (n * (n - 1) / 2)
    assert(crossRate <= 2 * baseRate,
      f"cross-copy pair rate $crossRate%.6f should track the corpus' own rate $baseRate%.6f, not exceed it")
  }

  test("neutrality verifier reports a bounded alias fraction on this corpus") {
    val worst = ScaleUp.verifyEmbeddingNeutrality(
      spark, Sf, Copies, SimilarityQueries.PairThreshold)
    assert(worst <= ScaleUp.MaxAliasFraction)
  }

  test("the verifier refuses a corpus whose replicas alias (bound made loud)") {
    val e = intercept[IllegalArgumentException] {
      // at threshold 0 every vector aliases at every lag: fraction 1.0
      ScaleUp.verifyEmbeddingNeutrality(spark, Sf, Copies, 0.0)
    }
    assert(e.getMessage.contains("replica aliasing"))
  }

  // ---- the >26-copy family (second upward decade, round-10 stretch) ----

  /** Every copy's composite cipher must be a distinct substitution, and
    * any two copies' comparison map must fix at most 2 letters per
    * class (the affine fixed-point bound the scaladoc argues) — that is
    * what keeps multi-char shingles within-copy at 100 copies.
    */
  test("affine cipher: 100 copies are pairwise distinct with <=2 fixed letters per class") {
    import spark.implicits._
    val alphabet = "abcdefghijklmnopqrstuvwxyz"
    val images: Seq[String] = Seq(alphabet).toDF("s")
      .select((0 until 100).map(k => ScaleUp.cipherText(col("s"), k).as(s"c$k")): _*)
      .head().toSeq.map(_.asInstanceOf[String])
    assert(images.head === alphabet, "copy 0 must be the identity")
    assert(images.distinct.size === 100, "all 100 letter maps must differ")
    for (a <- images.indices; b <- (a + 1) until images.size) {
      val fixed = images(a).zip(images(b)).count { case (x, y) => x == y }
      assert(fixed <= 2,
        s"copies $a,$b agree on $fixed letters — affine bound is 2")
    }
  }

  test("masked affine permutation: orthogonal (within-copy cosines exact) and distinct past the dim") {
    import spark.implicits._
    val dim = 64
    val x = Array.tabulate(dim)(i => math.sin(i * 1.7).toFloat)
    val y = Array.tabulate(dim)(i => math.cos(i * 0.9).toFloat)
    def cos(a: Array[Float], b: Array[Float]): Double = {
      val d = a.zip(b).map { case (p, q) => p.toDouble * q }.sum
      d / math.sqrt(a.map(v => v.toDouble * v).sum * b.map(v => v.toDouble * v).sum)
    }
    val base = cos(x, y)
    // k and k+dim share the rotation lag — only the sign mask separates
    // them; both must preserve the within-copy cosine bit-near-exactly
    for (k <- Seq(1, 5, 63, 64, 70, 99)) {
      val row = Seq((x, y)).toDF("x", "y").select(
        ScaleUp.transformVec(col("x"), k, dim).as("tx"),
        ScaleUp.transformVec(col("y"), k, dim).as("ty")).head()
      val tx = row.getSeq[Float](0).toArray
      val ty = row.getSeq[Float](1).toArray
      assert(math.abs(cos(tx, ty) - base) < 1e-6,
        s"copy $k transform must preserve within-copy cosine")
    }
    val t64 = Seq(Tuple1(x)).toDF("x")
      .select(ScaleUp.transformVec(col("x"), 64, dim).as("t")).head()
      .getSeq[Float](0).toArray
    assert(!t64.sameElements(x),
      "copy 64 must differ from copy 0 even though the rotation lag repeats")
  }

  test("pairwise embedding verifier stays bounded past the dim (sign masks carry it)") {
    // 70 copies > dim=64: pure rotation would alias copies (k, k+64)
    // byte-for-byte (fraction 1.0); the sign mask must keep every pair
    // under the bound
    val worst = ScaleUp.verifyEmbeddingNeutrality(
      spark, Sf, 70, SimilarityQueries.PairThreshold)
    assert(worst <= ScaleUp.MaxAliasFraction)
  }

  test("text guard refuses >40 copies on a digit-heavy corpus, passes on this one") {
    assert(ScaleUp.verifyTextNeutrality(spark, Sf, 100) <= ScaleUp.MaxDigitFraction)
    val tmp = Files.createTempDirectory("graft-digits").toString
    import spark.implicits._
    Seq((1L, "4711 0815 12345", "und", "synth", 15L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val e = intercept[IllegalArgumentException] {
      ScaleUp.verifyTextNeutrality(spark, tmp, ScaleUp.MaxDigitCopies + 1)
    }
    assert(e.getMessage.contains("digit"))
    // at or under the digit-map family size the same corpus is fine
    ScaleUp.verifyTextNeutrality(spark, tmp, ScaleUp.MaxDigitCopies)
  }
}
