package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.functions.{TextFunctions => T}

class TextFunctionsSpec extends SparkSpec {
  import spark.implicits._

  private def one[A](c: org.apache.spark.sql.Column, text: String): A =
    Seq(text).toDF("text").select(c).collect().head.getAs[A](0)

  private def oneSeq(c: org.apache.spark.sql.Column, text: String): List[Any] =
    Seq(text).toDF("text").select(c).collect().head.getSeq[Any](0).toList

  test("tokens splits on whitespace runs and drops empties") {
    assert(oneSeq(T.tokens(col("text")), "  a  b\tc ") == Seq("a", "b", "c"))
    assert(oneSeq(T.tokens(col("text")), "") == Seq.empty)
  }

  test("tokenHash matches md5 hex prefix") {
    val h = one[Long](T.tokenHash(col("text"), 10), "abc")
    // md5("abc") = 900150983cd24fb0... → 0x900150983c
    assert(h == java.lang.Long.parseLong("900150983c", 16))
  }

  test("shingles yields n-grams, distinct, and empty for short docs") {
    val sh = T.shingles(T.tokens(col("text")), 3)
    assert(oneSeq(sh, "a b c d") == Seq("a b c", "b c d"))
    assert(oneSeq(sh, "a b c a b c a") == Seq("a b c", "b c a", "c a b"))
    assert(oneSeq(sh, "a b") == Seq.empty)
    assert(oneSeq(sh, "") == Seq.empty)
  }

  test("minhash signature has k entries, nulls only for empty input") {
    val sig = T.minhashSignature(T.shingleHashes(T.shingles(T.tokens(col("text")), 3)), 16)
    val full = oneSeq(sig, "a b c d e")
    assert(full.size == 16 && full.forall(_ != null))
    val empty = oneSeq(sig, "a b")
    assert(empty.size == 16 && empty.forall(_ == null))
  }

  test("identical token sets share minhash signature regardless of order") {
    val sig = T.minhashSignature(T.shingleHashes(array_distinct(T.tokens(col("text")))), 16)
    val a = oneSeq(sig, "x y z w q")
    val b = oneSeq(sig, "q w z y x x")
    assert(a == b)
  }

  test("fingerprint is order-sensitive but deterministic") {
    val fp = T.fingerprint(T.tokens(col("text")))
    assert(one[Long](fp, "a b c") == one[Long](fp, "a b c"))
    assert(one[Long](fp, "a b c") != one[Long](fp, "c b a"))
  }

  test("simhash stays within nBits and groups identical docs") {
    val sh = T.simhash(T.tokenHashes(T.tokens(col("text"))), 16)
    val v = one[Long](sh, "spark rocks totally")
    assert(v >= 0 && v < (1 << 16))
    assert(v == one[Long](sh, "spark rocks totally"))
  }

  test("langId picks the profile with most hits") {
    val lid = T.langId(T.tokens(col("text")))
    assert(one[String](lid, "the cat is in the hat") == "en")
    assert(one[String](lid, "el perro que se fue no era de la casa") == "es")
    assert(one[String](lid, "der hund und die katze von den bergen") == "de")
    assert(one[String](lid, "pour le chat dans ce jardin") == "fr")
  }

  test("wordSetRatio and charClassRatio") {
    val r = T.wordSetRatio(T.tokens(col("text")), Seq("the", "a"))
    assert(one[Double](r, "the big a dog") == 0.5)
    val cr = T.charClassRatio(col("text"), "[a-z ]")
    assert(one[Double](cr, "ab12") == 0.5)
  }
}
