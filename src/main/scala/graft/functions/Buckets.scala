package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** THE deterministic hash-bucket idiom, in one place with its DuckDB
  * twin: bucket(x, m) = first 40 md5 bits of x, mod m. Deterministic
  * sampling (rel_hash_sample), the train/eval split
  * (dedup_contamination), and training-mix rates (text_sample_mix) all
  * derive from it — one definition keeps the Spark and oracle sides
  * from silently diverging (e.g. a substring-width tweak to one copy).
  *
  * Reproducibility is the point: rand()-based sampling changes under
  * retries, task re-execution, and engine versions; an md5 bucket of a
  * stable key never does, and pushes down as a plain per-row filter.
  */
object Buckets {

  /** Spark side: 10 hex chars = 40 bits — exact in a long, and small
    * enough that `conv`'s base-16 parse never overflows.
    */
  def mdBucket(c: Column, m: Int): Column =
    pmod(conv(substring(md5(c), 1, 10), 16, 10).cast("long"), lit(m))

  /** DuckDB spelling of [[mdBucket]] (hex-literal cast, same 40 bits). */
  def sqlBucket(expr: String, m: Int): String =
    s"(('0x' || substr(md5($expr), 1, 10))::BIGINT % $m)"
}
