package graft

import org.apache.spark.sql.SparkSession

/** Temp-view catalog over a scale-factor directory so the engine's SQL
  * surface (`spark.sql`) works against the same tables as the DataFrame
  * API. Idempotent; views are session-scoped metadata (no data copied).
  */
object Catalog {
  def registerViews(spark: SparkSession, sfDir: String): Unit =
    Tables.names.foreach { t =>
      Tables.load(spark, sfDir, t).createOrReplaceTempView(t)
    }
}
