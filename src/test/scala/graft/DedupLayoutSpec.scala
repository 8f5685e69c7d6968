package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.operators.DedupQueries
import graft.sources.DedupLayout

/** The incremental near-dup index: growing the on-disk candidate store
  * batch by batch must land on EXACTLY the pair set a from-scratch
  * build mines — and the from-scratch build must equal the registered
  * (oracle-checked) `dedup_minhash_pairs` candidates.
  */
class DedupLayoutSpec extends SparkSpec {

  private def pairSet(root: String): Set[(Long, Long)] =
    DedupLayout.pairs(spark, root).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

  test("two appended batches converge to the from-scratch index and the registered candidates") {
    val docs = Tables.documents(spark, Sf).select(col("doc_id"), col("text"))
    val inc = Files.createTempDirectory("graft-dl-inc").toString
    val scratch = Files.createTempDirectory("graft-dl-full").toString

    // base 3/5 of the corpus, then two arrival batches — a cross-batch
    // near-dup pair (batch1 doc ~ batch2 doc) must still be found,
    // because batch2 joins bands that already include batch1
    val m = col("doc_id") % 5
    DedupLayout.materialize(spark, docs.filter(m < 3), inc)
    DedupLayout.append(spark, docs.filter(m === 3), inc)
    DedupLayout.append(spark, docs.filter(m === 4), inc)

    DedupLayout.materialize(spark, docs, scratch)

    val grown = pairSet(inc)
    val rebuilt = pairSet(scratch)
    assert(grown === rebuilt,
      s"incremental index drifted: ${grown.size} vs ${rebuilt.size} pairs; " +
        s"missing=${(rebuilt -- grown).take(5)} extra=${(grown -- rebuilt).take(5)}")

    val registered = DedupQueries.minhashPairs(spark, Sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(rebuilt === registered,
      "the layout's from-scratch pairs must equal the oracle-checked candidates")

    // store invariants: id-ordered, duplicate-free
    assert(grown.forall { case (a, b) => a < b })
    val n = DedupLayout.pairs(spark, inc).count()
    assert(n === grown.size.toLong, s"pair store holds $n rows for ${grown.size} pairs")

    // the extended band/shingle stores cover the whole corpus
    assert(DedupLayout.shingles(spark, inc).select("doc_id").distinct().count()
      === docs.count())
    CacheLife.release(spark)
  }
}
