package graft

import org.apache.spark.sql.SparkSession

/** Temp-view catalog over a scale-factor directory so the engine's SQL
  * surface (`spark.sql`) works against the same tables as the DataFrame
  * API. Idempotent; views are session-scoped metadata (no data copied).
  */
object Catalog {
  // session+dir guard: registration is idempotent but each call re-opens
  // ten parquet footers; query functions call this per invocation, so
  // without the guard a bench pass pays hundreds of redundant loads
  private val registered = new java.util.HashSet[String]()

  def registerViews(spark: SparkSession, sfDir: String): Unit = synchronized {
    val key = s"${System.identityHashCode(spark)}:$sfDir"
    if (!registered.contains(key)) {
      Tables.names.foreach { t =>
        Tables.load(spark, sfDir, t).createOrReplaceTempView(t)
      }
      // marked done only AFTER all views exist: a throw above leaves the
      // key unregistered so the next call retries instead of no-opping
      // into TABLE_OR_VIEW_NOT_FOUND forever; synchronized covers the
      // concurrent in-flight window
      registered.add(key)
    }
  }
}
