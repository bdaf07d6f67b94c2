package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** 2-D skyline (Pareto frontier) — the multi-criteria "best tradeoff"
  * operator: keep exactly the rows no other row dominates, where row q
  * dominates row p iff q.x <= p.x AND q.y >= p.y with at least one strict
  * (x is minimized, y is maximized — e.g. cheapest-but-freshest).
  *
  * The naive formulation is a quadratic NOT-EXISTS self-theta-join. In 2-D
  * the frontier has a sort-order structure that collapses it to prefix
  * maxima: a row is on the skyline iff its y is the maximum within its own
  * x-group AND strictly exceeds every smaller-x group's maximum. That
  * prefix maximum over distinct x values is computed with the repo's
  * two-level bucketed discipline — NEVER a data-sized unpartitioned
  * window:
  *
  *  1. one shuffle: per-x-group max y (map-side combinable);
  *  2. value-range bucketing of the distinct-x table (global min/max x is
  *     a 1-row broadcast aggregate, buckets ordered by construction);
  *  3. a strict prefix max WITHIN each bucket (window partitioned by
  *     bucket) plus a cumulative max ACROSS the ≤`buckets` per-bucket
  *     summaries (a summary-sized window, [[Bounded.guard]]-protected);
  *  4. an equi-join back to the input on x keeps every row sitting exactly
  *     at its group's frontier point (co-duplicated frontier points are
  *     ALL skyline rows — none dominates the other).
  *
  * Scale shape: two shuffles (the x-group aggregate and the join back),
  * both on x; the only unpartitioned window runs over at most `buckets`
  * rows. Adversarial inputs where the frontier itself is O(n) make the
  * final join's build side large — the join is a plain equi-join, so AQE
  * picks the strategy; nothing here collects the frontier to the driver.
  */
object Pareto {

  /** Skyline rows of `df`: minimize `xCol`, maximize `yCol`. Both columns
    * must be integral (LONG-castable, exact comparisons — no float ties).
    * Returns the input rows (original columns) that are on the frontier.
    */
  def skyline2d(df: DataFrame, xCol: String, yCol: String,
                buckets: Int = 64): DataFrame = {
    require(buckets > 0, s"skyline2d: buckets must be positive, got $buckets")
    val x = col(xCol).cast("long")
    val y = col(yCol).cast("long")

    // per-x-group best y: one map-side-combinable shuffle on x
    val gx = df.select(x.as("__x"), y.as("__y"))
      .groupBy(col("__x")).agg(max(col("__y")).as("__gy"))

    // value-range bucketing: ordered by construction, no global sort.
    // Bucket arithmetic runs in DOUBLE space: 64-bit integer packing
    // ((x−xmin)·buckets) overflows for key ranges wider than ~2^57, and
    // even (x−xmin) itself can overflow when the range spans > 2^63.
    // IEEE rounding is monotone non-strict, so the double map preserves
    // bucket ordering; the ≤1-ulp slack only ever shifts a boundary key
    // into the adjacent bucket, which the prefix-max logic tolerates, and
    // the clamp pins the result into [0, buckets) so the summary window
    // stays bounded for every representable long range.
    val span = gx.agg(min(col("__x")).as("__xmin"), max(col("__x")).as("__xmax"))
    val bucketed = gx.crossJoin(broadcast(span))
      .withColumn("__b",
        least(greatest(
          ((col("__x").cast("double") - col("__xmin").cast("double")) * buckets /
            (col("__xmax").cast("double") - col("__xmin").cast("double") + 1.0d))
            .cast("int"), lit(0)), lit(buckets - 1)))

    // strict prefix max within a bucket (x is unique per gx row)
    val wLocal = Window.partitionBy(col("__b")).orderBy(col("__x"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val local = bucketed.withColumn("__lpm", max(col("__gy")).over(wLocal))

    // cumulative max across the <= buckets per-bucket summaries
    val bmax = bucketed.groupBy(col("__b")).agg(max(col("__gy")).as("__bmy"))
    val wCum = Window.orderBy(col("__b")).rowsBetween(Window.unboundedPreceding, -1)
    // the unpartitioned window runs over at most `buckets` rows: one row per
    // distinct __b, and __b ∈ [0, buckets) by construction — asserted at
    // runtime so a bucketing regression fails loudly, never silently
    // single-partitions the distinct-x table
    val prior = bmax.withColumn("__cum",
      max(Bounded.guard(col("__bmy"),
        col("__b") >= 0 && col("__b") < buckets,
        s"skyline2d: bucket id outside [0, $buckets) — summary window no longer bounded")
      ).over(wCum))

    val frontierGroups = local
      .join(broadcast(prior.select(col("__b"), col("__cum"))), Seq("__b"))
      .withColumn("__m1", greatest(coalesce(col("__lpm"), lit(Long.MinValue)),
        coalesce(col("__cum"), lit(Long.MinValue))))
      .filter((col("__lpm").isNull && col("__cum").isNull) || col("__gy") > col("__m1"))
      .select(col("__x"), col("__gy"))

    df.join(frontierGroups,
        x === col("__x") && y === col("__gy"), "leftsemi")
  }
}
