package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Co-bucketed storage layout for fact-fact joins (SURVEY §2.7 /
  * RelationalQueries scaladoc): writing both join sides bucketed by the
  * join key into the session catalog lets Spark plan a sort-merge join
  * with NO shuffle exchange on either side — at 100 TB the
  * `orders ⋈ lineitem` shuffle is the single largest data movement in
  * the pipeline, and this layout removes it for every downstream query
  * that joins on the bucket key.
  *
  * Mechanics: `bucketBy(n, key)` hashes rows into n files per
  * partition; the catalog records the bucket spec, and the planner
  * treats HashPartitioning(key, n) as already satisfied. Bucket counts
  * must MATCH on both sides (or divide evenly); sortBy within buckets
  * additionally removes the SMJ sort.
  */
object BucketedLayout {

  /** Persist `df` as a bucketed+sorted catalog table. */
  def save(df: DataFrame, table: String, key: String, buckets: Int): Unit =
    df.write
      .bucketBy(buckets, key)
      .sortBy(key)
      .mode("overwrite")
      .format("parquet")
      .saveAsTable(table)

  /** Co-bucket two join sides with one call (same bucket count — the
    * invariant that makes the join exchange-free).
    */
  def saveCoBucketed(left: (DataFrame, String, String),
                     right: (DataFrame, String, String), buckets: Int): Unit = {
    save(left._1, left._2, left._3, buckets)
    save(right._1, right._2, right._3, buckets)
  }

  def table(spark: SparkSession, name: String): DataFrame = spark.table(name)
}
