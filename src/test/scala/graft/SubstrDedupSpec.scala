package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.SubstrDedup
import graft.operators.SubstrDedup.W

/** Duplicate-passage dedup (ExactSubstr family): planted-passage golden
  * tests over a synthetic corpus (exact span positions known by
  * construction) plus full brute-force parity at sf0.001 — the DuckDB
  * hash-compare at sf0.01 is the cross-engine gate; this suite pins the
  * SEMANTICS (window duplication, maximal merge, excision) in-process.
  */
class SubstrDedupSpec extends SparkSpec {

  // ---- planted corpus: spans knowable by hand ----
  // P = 9 tokens -> two overlapping W=8 windows wherever it appears.
  private val P = (1 to 9).map(i => s"p$i").mkString(" ")
  private def plantedDocs: DataFrame = {
    import spark.implicits._
    Seq(
      (1L, s"u1 u2 $P u3"),            // P at tokens 2..10
      (2L, s"$P v1 v2"),               // P at tokens 0..8
      (3L, (1 to 10).map(i => s"w$i").mkString(" ")), // unique, no spans
      (4L, "x1 x2 x3 x4 x5"),          // shorter than W: no windows
      (5L, ((1 to 8).map(i => s"q$i") ++ Seq("z") ++ (1 to 8).map(i => s"q$i")).mkString(" ")),
      // ^ within-doc repeat: spans [0,7] and [9,16], 'z' splits them
      (6L, P),                          // entirely duplicated text
    ).toDF("doc_id", "text")
  }

  private def plantedSpans: Set[(Long, Long, Long)] = Set(
    (1L, 2L, 10L), (2L, 0L, 8L), (5L, 0L, 7L), (5L, 9L, 16L), (6L, 0L, 8L))

  test("planted passages: spans land exactly where constructed") {
    val got = SubstrDedup.spansOver(SubstrDedup.gramsOver(plantedDocs)).collect()
      .map(r => (r.getLong(0), r.getAs[Number]("span_start").longValue(),
        r.getAs[Number]("span_end").longValue())).toSet
    assert(got == plantedSpans)
  }

  test("planted passages: clean excises exactly the spans, empty-doc row survives") {
    val docs = plantedDocs
    val sp = SubstrDedup.spansOver(SubstrDedup.gramsOver(docs))
    val byId = SubstrDedup.cleanOver(docs, sp).collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getAs[Number]("n_removed").longValue()))).toMap
    assert(byId(1L) == (("u1 u2 u3", 9L)))
    assert(byId(2L) == (("v1 v2", 9L)))
    assert(byId(3L) == (((1 to 10).map(i => s"w$i").mkString(" "), 0L)))
    assert(byId(4L) == (("x1 x2 x3 x4 x5", 0L)))
    assert(byId(5L) == (("z", 16L)))
    assert(byId(6L) == (("", 9L))) // fully-duplicated doc stays visible
  }

  test("planted passages: stats coverage fractions") {
    val docs = plantedDocs
    val sp = SubstrDedup.spansOver(SubstrDedup.gramsOver(docs))
    val byId = SubstrDedup.statsOver(docs, sp).collect()
      .map(r => r.getLong(0) -> ((r.getAs[Number]("n_tokens").longValue(),
        r.getAs[Number]("dup_tokens").longValue(), r.getDouble(3)))).toMap
    assert(byId(1L) == ((12L, 9L, 0.75)))
    assert(byId(4L) == ((5L, 0L, 0.0)))
    assert(byId(6L) == ((9L, 9L, 1.0)))
    assert(byId.size == 6) // zero-span docs present with 0
  }

  // ---- brute-force parity on the real corpus ----

  /** T.tokens twin: whitespace split of trimmed text, empties dropped. */
  private def tok(text: String): Array[String] =
    text.trim.split("\\s+").filter(_.nonEmpty)

  private def bruteSpans(docs: Seq[(Long, String)]): Set[(Long, Long, Long, Long)] = {
    val windows = docs.flatMap { case (id, text) =>
      val ts = tok(text)
      if (ts.length < W) Seq.empty
      else (0 to ts.length - W).map(i => (id, i, ts.slice(i, i + W).mkString(" ")))
    }
    val dup = windows.groupBy(_._3).filter(_._2.size >= 2).keySet
    windows.filter(w => dup(w._3)).groupBy(_._1).flatMap { case (id, hs) =>
      val starts = hs.map(_._2).sorted
      // interval merge of [s, s+W-1]
      val spans = scala.collection.mutable.ArrayBuffer[(Int, Int)]()
      starts.foreach { s =>
        if (spans.nonEmpty && s <= spans.last._2 + 1) {
          val (a, b) = spans.last; spans(spans.length - 1) = (a, math.max(b, s + W - 1))
        } else spans += ((s, s + W - 1))
      }
      spans.map { case (a, b) => (id, a.toLong, b.toLong, (b - a + 1).toLong) }
    }.toSet
  }

  test("sf0.001 parity: spans match the brute-force reference") {
    val docs = Tables.documents(spark, Sf).select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    val want = bruteSpans(docs)
    val got = SubstrDedup.queries("dedup_substr_spans")(spark, Sf).collect()
      .map(r => (r.getLong(0), r.getAs[Number]("span_start").longValue(),
        r.getAs[Number]("span_end").longValue(),
        r.getAs[Number]("span_tokens").longValue())).toSet
    assert(want.nonEmpty, "corpus should contain duplicated windows at this sf")
    assert(got == want)
  }

  test("sf0.001 cross-query consistency: stats == spans rollup, clean removes dup_tokens") {
    val spans = SubstrDedup.queries("dedup_substr_spans")(spark, Sf).collect()
      .map(r => (r.getLong(0), r.getAs[Number]("span_tokens").longValue()))
    val wantDup = spans.groupBy(_._1).map { case (k, v) => k -> v.map(_._2).sum }
    val stats = SubstrDedup.queries("dedup_substr_stats")(spark, Sf).collect()
      .map(r => (r.getLong(0), r.getAs[Number]("n_tokens").longValue(),
        r.getAs[Number]("dup_tokens").longValue(), r.getDouble(3)))
    stats.foreach { case (id, n, dup, frac) =>
      assert(dup == wantDup.getOrElse(id, 0L), s"doc $id dup_tokens")
      assert(frac >= 0.0 && frac <= 1.0)
      if (n > 0) assert(math.abs(frac - dup.toDouble / n) < 1e-6)
    }
    val clean = SubstrDedup.queries("dedup_substr_clean")(spark, Sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getAs[Number]("n_removed").longValue()))
    val statsById = stats.map(s => s._1 -> s).toMap
    assert(clean.length == stats.length) // every doc survives as a row
    clean.foreach { case (id, text, removed) =>
      val (_, n, dup, _) = statsById(id)
      assert(removed == dup, s"doc $id n_removed != dup_tokens")
      val keptToks = if (text.isEmpty) 0 else tok(text).length
      assert(keptToks == n - removed, s"doc $id kept token count")
    }
  }

  test("clean_tokens is exactly clean's kept set: per-doc ordered re-join reproduces clean_text") {
    // the token-granular spelling (the oracle row that stays green at
    // 100x, where the string form's ordered string_agg cannot spill in
    // DuckDB) must carry the SAME information as the string form
    val toks = SubstrDedup.queries("dedup_substr_clean_tokens")(spark, Sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    val rejoined = toks.groupBy(_._1).map { case (id, rows) =>
      id -> rows.sortBy(_._2).map(_._3).mkString(" ")
    }
    val clean = SubstrDedup.queries("dedup_substr_clean")(spark, Sf).collect()
      .map(r => (r.getLong(0), r.getString(1))).toMap
    assert(clean.nonEmpty)
    clean.foreach { case (id, text) =>
      assert(rejoined.getOrElse(id, "") === text,
        s"doc $id: token-granular kept set drifted from clean_text")
    }
    // and positions are a strict subset of [0, n_tokens) with no dups
    val posSets = toks.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    posSets.foreach { case (id, ps) =>
      assert(ps.distinct.length === ps.length, s"doc $id repeated a kept position")
    }
  }

  test("the window width is a conf knob: W=12 re-windows and the oracle follows") {
    import spark.implicits._
    // two plants: a 12-token shared passage and an 8-token one. At the
    // default W=8 both are duplicated windows; at W=12 only the longer
    // one can produce an identical 12-token window.
    val shared12 = (1 to 12).map(i => s"s$i").mkString(" ")
    val shared8 = (1 to 8).map(i => s"e$i").mkString(" ")
    val docs = Seq(
      (1L, s"a1 a2 $shared12 a3"), (2L, s"$shared12 b1 b2"),
      (3L, s"c1 c2 $shared8 c3 c4"), (4L, s"$shared8 d1 d2 d3"))
      .toDF("doc_id", "text")
    def flagged(w: Int) = SubstrDedup.spansOver(SubstrDedup.gramsOver(docs, w), w)
      .select("doc_id").distinct().collect().map(_.getLong(0)).toSet
    assert(flagged(8) === Set(1L, 2L, 3L, 4L))
    assert(flagged(12) === Set(1L, 2L),
      "a W=12 run must not flag the 8-token plant")
    // the knob reaches the registered query and the ORACLE regenerates
    // from the same live value (production W=50 is this one conf away)
    try {
      spark.conf.set(SubstrDedup.WKey, "12")
      assert(SubstrDedup.oracle("dedup_substr_spans").contains("toks[i+12]"))
      assert(!SubstrDedup.oracle("dedup_substr_spans").contains("toks[i+13]"))
      SubstrDedup.queries("dedup_substr_spans")(spark, Sf).count() // runs clean
    } finally spark.conf.unset(SubstrDedup.WKey)
    assert(!SubstrDedup.oracle("dedup_substr_spans").contains("toks[i+12]"),
      "unsetting the knob must restore the default-width oracle")
    CacheLife.release(spark)
  }

  // ---- winnowing ----

  /** Reference winnowing: trailing-WinnowW window min of
    * (28-bit md5-prefix selector, rightmost tie-break), per doc.
    */
  private def bruteWinnow(docs: Seq[(Long, String)]): Set[(Long, Long)] = {
    val W = SubstrDedup.W
    val w = SubstrDedup.WinnowW
    docs.flatMap { case (id, text) =>
      val ts = tok(text)
      if (ts.length < W) Seq.empty
      else {
        val hs = (0 to ts.length - W).map { i =>
          java.lang.Long.parseLong(
            org.apache.commons.codec.digest.DigestUtils
              .md5Hex(ts.slice(i, i + W).mkString(" ")).take(7), 16)
        }
        (w - 1 until hs.length).flatMap { e =>
          val window = (e - w + 1 to e)
          val minKey = window.map(hs).min
          val pick = window.filter(p => hs(p) == minKey).max // rightmost min
          Some((id, pick.toLong))
        }
      }
    }.toSet
  }

  test("winnowed selection matches the reference algorithm position for position") {
    val docs = Tables.documents(spark, Sf).select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    val want = bruteWinnow(docs)
    val got = SubstrDedup.winnowFpOver(SubstrDedup.gramsOver(
        Tables.documents(spark, Sf).select("doc_id", "text"))).collect()
      .map(r => (r.getLong(0), r.getAs[Number]("pos").longValue())).toSet
    assert(want.nonEmpty && got == want)
  }

  test("winnowing guarantee: a shared passage of t = W+WinnowW-1 tokens is flagged in both docs") {
    import spark.implicits._
    val t = SubstrDedup.W + SubstrDedup.WinnowW - 1
    val shared = (1 to t).map(i => s"s$i").mkString(" ")
    val docs = Seq(
      (10L, s"a1 a2 a3 $shared a4"),
      (20L, s"$shared b1 b2 b3 b4"),
      (30L, (1 to 20).map(i => s"c$i").mkString(" "))).toDF("doc_id", "text")
    val sp = SubstrDedup.mergeSpans(SubstrDedup.dupHits(
      SubstrDedup.winnowFpOver(SubstrDedup.gramsOver(docs))))
    val byDoc = sp.collect().map(_.getLong(0)).toSet
    assert(byDoc == Set(10L, 20L), s"guarantee violated: flagged $byDoc")
  }

  test("sf0.001 winnow spans are a subset of exact spans' coverage; recall row is consistent") {
    def cover(rows: Array[org.apache.spark.sql.Row]): Set[(Long, Long)] =
      rows.flatMap { r =>
        val (id, a, b) = (r.getLong(0), r.getAs[Number](1).longValue(), r.getAs[Number](2).longValue())
        (a to b).map(p => (id, p))
      }.toSet
    val ex = cover(SubstrDedup.queries("dedup_substr_spans")(spark, Sf).collect())
    val wn = cover(SubstrDedup.queries("dedup_substr_winnow_spans")(spark, Sf).collect())
    assert(wn.nonEmpty && wn.subsetOf(ex), "winnowed covers must never exceed exact covers")
    val r = SubstrDedup.queries("dedup_substr_winnow_recall")(spark, Sf).collect()
    assert(r.length == 1)
    val row = r.head
    val (nw, nf) = (row.getLong(0), row.getLong(1))
    val (nex, ncov) = (row.getLong(3), row.getLong(4))
    assert(nex == ex.size && ncov == wn.size, "counts must equal the span covers")
    assert(nf < nw, "winnowing must shrink the index")
    val frac = row.getDouble(2)
    assert(frac > 0.1 && frac < 0.8, s"index fraction $frac implausible for w=${SubstrDedup.WinnowW}")
    assert(row.getDouble(5) == BigDecimal(ncov.toDouble / nex)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    CacheLife.release(spark)
  }

  test("clean_sample is exactly clean restricted to the md5 bucket-0 docs") {
    val sampleIds = Tables.documents(spark, Sf)
      .filter(graft.functions.Buckets.mdBucket(col("doc_id").cast("string"),
        SubstrDedup.SampleBuckets) === 0)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    def rows(df: DataFrame): Map[Long, (String, Long)] =
      df.collect().map(r => r.getLong(0) ->
        ((r.getString(1), r.getAs[Number](2).longValue()))).toMap
    val full = rows(SubstrDedup.clean(spark, Sf))
    val samp = rows(SubstrDedup.cleanSample(spark, Sf))
    // span derivation is corpus-wide; only the re-join restricts, so
    // the sample must agree row-for-row with the full clean
    assert(samp.keySet === sampleIds,
      s"sample rows must cover exactly the bucket-0 docs (got ${samp.size} of ${sampleIds.size})")
    samp.foreach { case (id, v) =>
      assert(full(id) === v, s"doc $id drifted between clean and clean_sample")
    }
    CacheLife.release(spark)
  }

  test("dedup.cleanchunk knob: the 20 doc-bucket chunks PARTITION the full clean output") {
    intercept[IllegalArgumentException] {
      withConf(SubstrDedup.CleanChunkKey ->
        SubstrDedup.CleanChunkBuckets.toString) {
        SubstrDedup.cleanChunkOf(spark)
      }
    }
    def rows(df: DataFrame): Map[Long, (String, Long)] =
      df.collect().map(r => r.getLong(0) ->
        ((r.getString(1), r.getAs[Number](2).longValue()))).toMap
    val full = rows(SubstrDedup.clean(spark, Sf))
    // each chunk is the exact per-doc restriction of the full clean
    // (span derivation stays corpus-wide), the chunks are doc-disjoint,
    // and their union is the WHOLE output — the property that lets the
    // 100× string-granularity oracle run as 20 DuckDB-feasible
    // string_agg chunks (checked on 3 chunks + the union law on all 20
    // doc sets)
    val seen = scala.collection.mutable.Set.empty[Long]
    for (b <- Seq(0, 7, 19)) {
      val chunk = withConf(SubstrDedup.CleanChunkKey -> b.toString) {
        rows(SubstrDedup.cleanChunk(spark, Sf))
      }
      chunk.foreach { case (id, v) =>
        assert(full(id) === v, s"doc $id drifted between clean and chunk $b")
      }
      assert(chunk.keySet.intersect(seen.toSet).isEmpty,
        s"chunk $b overlaps another chunk")
      seen ++= chunk.keySet
    }
    val allIds = (0 until SubstrDedup.CleanChunkBuckets).flatMap { b =>
      withConf(SubstrDedup.CleanChunkKey -> b.toString) {
        SubstrDedup.cleanChunk(spark, Sf).select("doc_id")
          .collect().map(_.getLong(0))
      }
    }
    assert(allIds.distinct.length == allIds.length, "chunks must be disjoint")
    assert(allIds.toSet == full.keySet,
      "the 20 chunks must cover every doc in the full clean output")
    CacheLife.release(spark)
  }

  test("winnow excision keeps a superset of the exact excision (covers shrink, kept grows)") {
    def kept(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = kept(SubstrDedup.cleanTokens(spark, Sf))
    val winnow = kept(SubstrDedup.winnowCleanTokens(spark, Sf))
    // winnowed covers ⊆ exact covers (precision 1), so the winnow
    // excision removes FEWER positions — its kept set must contain
    // every exactly-kept (doc, pos) and be strictly larger here (the
    // sf0.001 corpus has sub-t matches winnowing misses by contract)
    assert(exact.subsetOf(winnow),
      s"winnow excision removed positions the exact excision kept: ${(exact -- winnow).take(5)}")
    assert(winnow.size > exact.size,
      "expected winnow recall < 1 on this corpus — if equal, the test corpus stopped exercising the trade")
    CacheLife.release(spark)
  }

  test("spans are maximal: disjoint and non-adjacent per doc, each >= W tokens") {
    val byDoc = SubstrDedup.queries("dedup_substr_spans")(spark, Sf).collect()
      .map(r => (r.getLong(0), r.getAs[Number]("span_start").longValue(),
        r.getAs[Number]("span_end").longValue(), r.getAs[Number]("span_tokens").longValue()))
      .groupBy(_._1)
    byDoc.values.foreach { sp =>
      val sorted = sp.sortBy(_._2)
      sorted.foreach { case (_, a, b, n) =>
        assert(b >= a && n == b - a + 1 && n >= W)
      }
      sorted.sliding(2).foreach {
        case Array((_, _, e1, _), (_, s2, _, _)) => assert(s2 > e1 + 1, "adjacent spans unmerged")
        case _ =>
      }
    }
  }
}
