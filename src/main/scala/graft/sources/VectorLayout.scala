package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.SimilarityQueries

/** Cell-partitioned materialization of the embedding corpus — the IVF
  * storage layout every ANN scaladoc in [[graft.operators.SimilarityQueries]]
  * points at ("at 100 TB the cell is a pruned partition"), made real.
  *
  * Write once: each vector lands in the `cell=<id>` directory of its
  * TRAINED coarse-quantizer cell (the same deterministic k-means
  * assignment `sim_ann_kmeans` probes). A probe then filters on a
  * LITERAL cell id, so Spark lists only that one directory — metadata
  * partition pruning, `PartitionFilters` in the plan (asserted by
  * VectorLayoutSpec) — instead of scanning the corpus. This is the
  * difference between touching 1/K of the files and touching all of
  * them; nprobe>1 or the PQ code table compose on top unchanged.
  */
object VectorLayout {

  /** One-time rewrite: embeddings → `outDir` partitioned by trained
    * cell. Repartitioning by the partition column keeps one file per
    * cell (avoids many-small-files-per-task).
    */
  def materialize(spark: SparkSession, sfDir: String, outDir: String): Unit =
    Tables.embeddings(spark, sfDir)
      .join(SimilarityQueries.kmeansCells(spark, sfDir), Seq("vec_id"))
      .repartition(col("cell"))
      .write.mode("overwrite").partitionBy("cell").parquet(outDir)

  def vectors(spark: SparkSession, outDir: String): DataFrame =
    spark.read.parquet(outDir)

  /** The `sim_ann_kmeans` probe against the partitioned layout: look up
    * the query's cell (one row), filter the corpus on it as a literal —
    * partition pruning — and rank the one cell exactly. The collect
    * fetches a single model-sized scalar (the cell id) + the query
    * vector, the same "the collect is the model, not the data" contract
    * as the Lloyd loop.
    */
  def probe(spark: SparkSession, outDir: String,
            queryVecId: Long = SimilarityQueries.QueryVecId): DataFrame = {
    val t = vectors(spark, outDir)
    // partition-directory values are re-inferred as int on read — cast
    // back to the assignment's long
    val qrow = t.filter(col("vec_id") === queryVecId)
      .select(col("cell").cast("long"), col("embedding")).head
    val qcell = qrow.getLong(0)
    val qv = typedLit(qrow.getSeq[Float](1))
    t.filter(col("cell") === lit(qcell) && col("vec_id") =!= queryVecId)
      .select(col("vec_id"),
        round(call_function("graft_cosine", col("embedding"), qv), 6).as("cos"))
      .orderBy(col("cos").desc, col("vec_id").asc)
      .limit(10)
  }
}
