package graft

import graft.operators.TextQueries

/** Hand-computed fixture for the funnel's SURVIVING-MIN keep semantics.
  *
  * The DuckDB oracle shares the staged formula with the engine, so an
  * engine↔oracle hash match cannot distinguish "keep the smallest
  * surviving doc of a duplicate group" (correct sequential-pipeline
  * semantics) from "keep the global-min doc" (which silently drops a
  * whole group whenever its min doc failed an earlier stage). This
  * fixture pins the difference:
  *
  *   - docs 1 and 7 are byte-identical; 1 fails the lang filter. The
  *     funnel must keep 7 (the only surviving copy) — global-min keep
  *     would count the group as shipping zero copies.
  *   - docs 2, 3, 5 are one near-dup cluster; 2 (the label min) fails
  *     quality. The representative must be 3, the smallest SURVIVOR —
  *     global-min would drop the cluster entirely.
  */
class TextFunnelSpec extends SparkSpec {

  test("dedup stages keep the smallest surviving doc, not the global min") {
    val sess = spark
    import sess.implicits._

    val flagged = Seq(
      // (doc_id, f_lang, f_qual, text_hash, f_samp)
      (1L, false, true, "h1", true), // exact-dup of 7, fails lang
      (2L, true, false, "h2", true), // cluster min, fails quality
      (3L, true, true, "h3", true), // surviving cluster rep
      (4L, true, true, "h4", true), // clean unique doc
      (5L, true, true, "h5", true), // cluster member, loses to rep 3
      (6L, true, true, "h6", false), // survives all but sampling
      (7L, true, true, "h1", true) // surviving copy of the 1/7 pair
    ).toDF("doc_id", "f_lang", "f_qual", "text_hash", "f_samp")

    val labels = Seq((2L, 2L), (3L, 2L), (5L, 2L)).toDF("c_doc", "cluster_id")

    val got = TextQueries.funnelCounts(flagged, labels).collect()
      .map(r => r.getString(0) -> r.getLong(2)).toMap

    val expected = Map(
      "raw" -> 7L,
      "lang_en" -> 6L, // all but 1
      "quality" -> 5L, // drops 2
      "exact_dedup" -> 5L, // 7 survives: keep over {7}, not global min 1
      "near_dedup" -> 4L, // rep is 3 (smallest SURVIVOR), 5 drops
      "sampled" -> 3L) // 6 drops
    assert(got == expected, s"got $got")
  }
}
