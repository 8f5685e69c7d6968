package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.operators.TextQueries
import graft.sources.TextLayout

/** The incremental token store: arrivals tokenize once into their own
  * batch partition, the re-derived aggregates must equal the
  * registered corpus-wide queries, and re-running a batch must change
  * nothing (count-checked).
  */
class TextLayoutSpec extends SparkSpec {

  test("appended batches re-derive the registered vocabulary exactly; re-append is idempotent") {
    val docs = Tables.documents(spark, Sf).select(col("doc_id"), col("text"))
    val root = Files.createTempDirectory("graft-tl").toString
    val m = col("doc_id") % 4

    TextLayout.materialize(spark, docs.filter(m < 2), root)
    TextLayout.append(spark, docs.filter(m === 2), root, batchId = 0L)
    TextLayout.append(spark, docs.filter(m === 3), root, batchId = 1L)

    // the log covers exactly the corpus token multiset
    val total = TextLayout.tokens(spark, root).count()
    val want = docs.select(explode(graft.functions.TextFunctions.tokens(col("text")))).count()
    assert(total === want, s"token log holds $total rows, corpus tokenizes to $want")

    // re-derived vocabulary == the registered (oracle-checked) query
    val derived = TextLayout.vocab(spark, root).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    val registered = TextQueries.tokenFreq(spark, Sf).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(derived === registered,
      "vocabulary re-derived from the log drifted from text_token_freq")

    // and the tf table matches an independent corpus-wide recomputation
    // over the registered vocabulary, value for value
    val tf = TextLayout.termFreq(spark, root).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    val expectedTf = docs
      .select(col("doc_id"),
        explode(graft.functions.TextFunctions.tokens(col("text"))).as("token"))
      .join(broadcast(TextQueries.tokenFreq(spark, Sf).select("token")), Seq("token"))
      .groupBy("doc_id", "token").agg(count("*").as("tf"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(tf === expectedTf,
      "re-derived tf table drifted from the corpus-wide recomputation")

    // idempotence: re-running batch 1 overwrites its own partition —
    // in BOTH logs
    TextLayout.append(spark, docs.filter(m === 3), root, batchId = 1L)
    assert(TextLayout.tokens(spark, root).count() === total,
      "re-appending a batch must not grow the log")
    assert(TextLayout.tokenCounts(spark, root).agg(sum("tf")).head.getLong(0) === total,
      "re-appending a batch must not grow the count partials")

    // the partials carry the same multiset at a strictly smaller row
    // count — the re-aggregate input shrink the partials exist for
    val partialRows = TextLayout.tokenCounts(spark, root).count()
    assert(partialRows < total,
      s"partials must be smaller than the raw log: $partialRows vs $total")
    CacheLife.release(spark)
  }

  test("append refuses a doc_id replayed under a NEW batch id") {
    val docs = Tables.documents(spark, Sf).select(col("doc_id"), col("text"))
    val root = Files.createTempDirectory("graft-tl-guard").toString
    val m = col("doc_id") % 4
    TextLayout.materialize(spark, docs.filter(m < 3), root)
    TextLayout.append(spark, docs.filter(m === 3), root, batchId = 0L)
    val e = intercept[Exception] {
      TextLayout.append(spark, docs.filter(m === 3), root, batchId = 1L)
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ messages(x.getCause))
    assert(messages(e).exists(_.contains("already exists in the token-log prefix")),
      s"expected the replay refusal, got: ${messages(e).mkString(" | ")}")
    CacheLife.release(spark)
  }
}
