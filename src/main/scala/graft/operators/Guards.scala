package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Execution-time refusal guards: the shared machinery behind the
  * semantic-dedup occupancy bound and the curriculum domain bound
  * (round-7 review: the idiom was copy-pasted per site). The guard is
  * a FILTER condition — `raise_error` fires inside the scan the
  * protected operator consumes, so an out-of-bound input kills the
  * action before the quadratic/corpus-sized work materializes, while
  * plan construction stays job-free (the round-6 advice that replaced
  * the eager `.head` guards).
  */
object Guards {

  /** True while `count` ≤ `bound`; raises `msg` at evaluation above it.
    * `count` must be a non-foldable column (an aggregate joined back
    * onto the rows) or the optimizer could fold the branch away.
    */
  private[graft] def refusalFilter(count: Column, bound: Long,
                                   msg: Column): Column =
    when(count > bound, raise_error(msg).cast("boolean"))
      .otherwise(lit(true))
}
