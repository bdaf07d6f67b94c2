package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Executable boundedness invariants for the deliberately-unpartitioned
  * windows (rrfFuse's fused-list rank, dsirSelect's global top-k,
  * perplexityBuckets' bucket-summary running sum). Each of those windows is
  * bounded BY DESIGN — its input is k-list-sized, 16^b·k-survivor-sized, or
  * bucket-domain-sized — but a comment-only invariant can't distinguish
  * itself from an accidental future unbounded global window in the same
  * `WindowExec: No Partition Defined` warning noise. [[guard]] turns the
  * invariant into a per-row runtime assertion that is part of a value the
  * query consumes, so column pruning cannot drop it and a violated bound
  * fails the query loudly instead of silently single-partitioning the
  * corpus.
  */
object Bounded {

  /** `value + 0` when `cond` holds for the row; raises (Spark's
    * `assert_true` → RaiseError) otherwise. The assertion rides inside the
    * returned value, so it executes exactly where the value does — no extra
    * pass, one comparison per (already bounded) row.
    */
  def guard(value: Column, cond: Column, msg: String): Column =
    value + coalesce(assert_true(cond, lit(msg)).cast("long"), lit(0L))
}
