package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis building blocks for the LLM-data-pipeline operators
  * (SURVEY.md §7.3 phase 5): tokenization, token hashing, shingling,
  * MinHash signatures, SimHash, positional fingerprints, quality ratios.
  *
  * Everything here is a pure Catalyst expression tree (higher-order array
  * functions — `transform`/`aggregate`/`filter` — over built-ins), so it
  * whole-stage-codegens and never leaves the JVM: no UDFs, no Python. At
  * 100 TB these are embarrassingly parallel per-row maps — no shuffle —
  * and the only wide stages are the groupBys/joins layered on top by the
  * query modules.
  *
  * Cross-engine determinism contract: every function has an exact DuckDB
  * spelling in [[TextOracle]]; hashes are defined as integer arithmetic
  * over md5 hex prefixes (md5 agrees everywhere), never engine-native
  * hash functions (Spark xxhash64 ≠ DuckDB hash).
  */
object TextFunctions {

  /** Whitespace tokens, empty-string-safe. */
  def tokens(text: Column): Column =
    filter(split(trim(text), "\\s+"), t => t =!= "")

  /** First `nHex` hex chars of md5 as a non-negative long (4 bits/char).
    * nHex ≤ 15 keeps the value < 2^60, leaving headroom for arithmetic.
    */
  def tokenHash(t: Column, nHex: Int): Column = {
    require(nHex <= 15, "16 hex chars overflows signed long")
    conv(substring(md5(t), 1, nHex), 16, 10).cast("long")
  }

  /** Distinct word n-gram shingles (the MinHash input set).
    * Docs with fewer than n tokens yield an empty array — guarded
    * explicitly because Spark's `sequence(0, -1)` counts DOWN (yields
    * [0, -1]) rather than returning empty.
    */
  def shingles(toks: Column, n: Int): Column = {
    val grams = array_distinct(
      transform(sequence(lit(0), size(toks) - n),
        i => concat_ws(" ", (0 until n).map(k => element_at(toks, i + k + 1)): _*)))
    when(size(toks) >= n, grams).otherwise(lit(Array.empty[String]))
  }

  /** Distinct character n-grams — the other classic near-dup unit
    * (robust to tokenization differences; catches partial overlap word
    * shingles miss). Empty when the text is shorter than n.
    */
  def charShingles(text: Column, n: Int): Column = {
    val grams = array_distinct(
      transform(sequence(lit(0), length(text) - n), i => text.substr(i + lit(1), lit(n))))
    when(length(text) >= n, grams).otherwise(lit(Array.empty[String]))
  }

  /** Base hashes of a shingle array, reduced mod p: computed ONCE per
    * row so the k permutations below reuse them instead of re-running
    * md5 k× per shingle.
    */
  def shingleHashes(sh: Column, p: Long = MinhashPrime): Column =
    transform(sh, s => tokenHash(s, 10) % p)

  /** One MinHash value over pre-hashed shingles: min of (a*h+b) mod p.
    * h < p = 2^31-1 and a < 2^11 keep a*h+b well under 2^63.
    */
  def minhash(hashes: Column, a: Long, b: Long, p: Long): Column =
    array_min(transform(hashes, h => (lit(a) * h + lit(b)) % p))

  val MinhashPrime = 2147483647L

  /** k-permutation MinHash signature as an array column. */
  def minhashSignature(hashes: Column, k: Int, p: Long = MinhashPrime): Column =
    array((0 until k).map(j => minhash(hashes, 37L + 101L * j, 91L + 53L * j, p)): _*)

  /** Hashes of each token (the SimHash input) — compute this in its OWN
    * projection so the per-bit votes below reuse one md5 pass per token
    * instead of nBits passes (higher-order functions are interpreted, not
    * codegen'd, and get no common-subexpression elimination — inlining
    * the hash into each bit made SimHash 16× slower).
    */
  def tokenHashes(toks: Column): Column = transform(toks, t => tokenHash(t, 10))

  /** nBits-bit SimHash over pre-hashed tokens: bit j is set when more
    * hashes have bit j set than clear (sum of ±1 votes > 0).
    */
  def simhash(hashes: Column, nBits: Int): Column = {
    require(nBits <= 16, "keep the vote expression tree small")
    val bitCols = (0 until nBits).map { j =>
      val votes = aggregate(
        hashes, lit(0L),
        (acc, h) => acc + when(shiftright(h, j).bitwiseAND(1) === 1, 1L).otherwise(-1L))
      when(votes > 0, lit(1L) * (1L << j)).otherwise(0L)
    }
    bitCols.reduce(_ + _)
  }

  private val Pows31 = array(Seq(1L, 31L, 961L, 29791L, 923521L).map(lit): _*)

  /** Positional polynomial fingerprint: Σᵢ h28(tᵢ)·31^(i mod 5).
    * 28-bit token hashes × 31⁴ × ~1k tokens stays < 2^62 — exact integer
    * arithmetic on both engines, order-sensitive (unlike a plain token-set
    * hash), and computable in one narrow pass.
    */
  def fingerprint(toks: Column): Column =
    aggregate(
      transform(toks, (t, i) => tokenHash(t, 7) * element_at(Pows31, (i % 5) + 1)),
      lit(0L),
      (acc, x) => acc + x)

  /** Fraction of tokens found in `words` (e.g. a stopword list). */
  def wordSetRatio(toks: Column, words: Seq[String]): Column =
    size(filter(toks, t => t.isInCollection(words))).cast("double") / size(toks)

  /** Fraction of characters matching a character-class regex like "[a-z]". */
  def charClassRatio(text: Column, keepClass: String): Column =
    length(regexp_replace(text, s"[^${keepClass.stripPrefix("[").stripSuffix("]")}]", ""))
      .cast("double") / length(text)

  // Language-ID stopword profiles. Deliberately small: the heuristic is
  // argmax over profile-hit counts with a fixed tie-break order, so both
  // engines compute the identical deterministic label.
  val LangProfiles: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "of", "and", "to", "a", "in", "is", "it", "you", "that"),
    "es" -> Seq("el", "la", "de", "que", "y", "en", "un", "ser", "se", "no"),
    "de" -> Seq("der", "die", "und", "in", "den", "von", "zu", "das", "mit", "sich"),
    "fr" -> Seq("le", "la", "de", "et", "un", "en", "que", "pour", "dans", "ce"))

  /** Heuristic language ID: most profile hits wins; ties resolve in
    * [[LangProfiles]] declaration order.
    */
  def langId(toks: Column): Column = {
    val counts = LangProfiles.map { case (lang, words) =>
      lang -> size(filter(toks, t => t.isInCollection(words)))
    }
    counts.zipWithIndex.foldRight(lit(counts.last._1): Column) {
      case ((((lang, c)), i), els) =>
        val laterCounts = counts.drop(i + 1).map(_._2)
        if (laterCounts.isEmpty) els
        else when(laterCounts.map(c >= _).reduce(_ && _), lit(lang)).otherwise(els)
    }
  }
}
