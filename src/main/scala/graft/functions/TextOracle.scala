package graft.functions

/** DuckDB spellings of [[TextFunctions]] — each builder returns the SQL
  * fragment computing the identical value, so oracle queries are generated
  * from the same constants (hash widths, permutation seeds, profiles) and
  * can never drift from the Spark side.
  *
  * Engine-mapping notes:
  *   - DuckDB list lambdas index 1-based; Spark's `transform` 0-based —
  *     every positional formula here substitutes (i-1).
  *   - hex→int: Spark `conv(hex,16,10)` ≡ DuckDB `('0x'||hex)::BIGINT`.
  *   - DuckDB needs the 'g' flag for replace-all `regexp_replace`; Spark
  *     replaces all matches by default.
  */
object TextOracle {
  /** Tokens of a text column expression. */
  def tokens(text: String): String =
    s"list_filter(regexp_split_to_array(trim($text), '\\s+'), x -> x != '')"

  def tokenHash(t: String, nHex: Int): String =
    s"('0x' || substr(md5($t), 1, $nHex))::BIGINT"

  def shingles(toks: String, n: Int): String = {
    val parts = (0 until n).map(k => s"$toks[i+$k]").mkString(", ")
    // range(a, b) is half-open; len-n+1 starts, each concatenating n tokens
    s"list_distinct(list_transform(range(1, greatest(len($toks) - ${n - 1}, 0) + 1), i -> concat_ws(' ', $parts)))"
  }

  def charShingles(text: String, n: Int): String =
    s"list_distinct(list_transform(range(1, greatest(length($text) - ${n - 1}, 0) + 1), i -> substr($text, i, $n)))"

  def shingleHashes(sh: String, p: Long = TextFunctions.MinhashPrime): String =
    s"list_transform($sh, s -> ${tokenHash("s", 10)} % $p)"

  def minhash(hashes: String, a: Long, b: Long, p: Long): String =
    s"list_min(list_transform($hashes, h -> ($a * h + $b) % $p))"

  def minhashSignature(hashes: String, k: Int, p: Long = TextFunctions.MinhashPrime): String =
    (0 until k).map(j => minhash(hashes, 37L + 101L * j, 91L + 53L * j, p)).mkString("[", ", ", "]")

  def tokenHashes(toks: String): String =
    s"list_transform($toks, t -> ${tokenHash("t", 10)})"

  /** SimHash over pre-hashed tokens (mirror of TextFunctions.simhash). */
  def simhash(hashes: String, nBits: Int): String =
    (0 until nBits).map { j =>
      s"(CASE WHEN list_sum(list_transform($hashes, h -> CASE WHEN (h >> $j) & 1 = 1 THEN 1 ELSE -1 END)) > 0 THEN ${1L << j} ELSE 0 END)"
    }.mkString("(", " + ", ")")

  // list_sum over BIGINT widens to HUGEINT — cast back (values < 2^62).
  def fingerprint(toks: String): String =
    s"list_sum(list_transform($toks, (t, i) -> ${tokenHash("t", 7)} * ([1,31,961,29791,923521])[((i-1) % 5) + 1]))::BIGINT"

  private def inList(words: Seq[String]): String =
    words.map(w => s"'$w'").mkString("(", ", ", ")")

  def wordSetRatio(toks: String, words: Seq[String]): String =
    s"len(list_filter($toks, t -> t IN ${inList(words)}))::DOUBLE / len($toks)"

  def charClassRatio(text: String, keepClass: String): String = {
    val inner = keepClass.stripPrefix("[").stripSuffix("]")
    s"length(regexp_replace($text, '[^$inner]', '', 'g'))::DOUBLE / length($text)"
  }

  def langId(toks: String): String = {
    val counts = TextFunctions.LangProfiles.map { case (lang, words) =>
      lang -> s"len(list_filter($toks, t -> t IN ${inList(words)}))"
    }
    val branches = counts.zipWithIndex.dropRight(1).map { case ((lang, c), i) =>
      val cond = counts.drop(i + 1).map(_._2).map(o => s"$c >= $o").mkString(" AND ")
      s"WHEN $cond THEN '$lang'"
    }
    s"(CASE ${branches.mkString(" ")} ELSE '${counts.last._1}' END)"
  }
}
