package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed EXCLUSIVE prefix sum over a totally-ordered column — the
  * primitive behind sequential bin packing (compaction planning), offset
  * assignment, and cumulative quota logic, computed WITHOUT a data-sized
  * unpartitioned window:
  *
  *  1. value-range bucketing of the order column (global min/max is a
  *     1-row broadcast aggregate; buckets are ordered by construction);
  *  2. a local exclusive prefix sum WITHIN each bucket (window partitioned
  *     by bucket);
  *  3. per-bucket totals, their cumulative sums across the ≤`buckets`
  *     summary rows ([[Bounded.guard]]-asserted), broadcast back.
  *
  * The same two-level discipline as [[Pareto.skyline2d]]'s prefix maxima —
  * scan(+) instead of scan(max). `orderCol` must be unique per row (a
  * total order: ties would make "exclusive prefix" ambiguous) — asserted
  * at runtime via the bucket-local rank.
  */
object PrefixOps {

  /** Adds `prefixCol` = Σ value over all rows STRICTLY before this row in
    * `orderCol` order (0 for the first row). Input columns are preserved.
    */
  def exclusivePrefixSum(df: DataFrame, orderCol: String, valueCol: String,
                         prefixCol: String, buckets: Int = 64): DataFrame = {
    require(buckets > 0, s"exclusivePrefixSum: buckets must be positive, got $buckets")
    require(!df.columns.contains(prefixCol),
      s"exclusivePrefixSum: input already has a column named '$prefixCol'")
    val o = col(orderCol).cast("long")
    val v = col(valueCol).cast("long")

    // bucket arithmetic in DOUBLE space (see [[Pareto.skyline2d]]): the
    // 64-bit packing overflows for order-key ranges wider than ~2^57; the
    // monotone double map + clamp keeps __b ∈ [0, buckets) for every
    // representable long range without an undocumented precondition
    val span = df.agg(min(o).as("__omin"), max(o).as("__omax"))
    val bucketed = df.crossJoin(broadcast(span))
      .withColumn("__b",
        least(greatest(
          ((o.cast("double") - col("__omin").cast("double")) * buckets /
            (col("__omax").cast("double") - col("__omin").cast("double") + 1.0d))
            .cast("int"), lit(0)), lit(buckets - 1)))
      .drop("__omin", "__omax")

    // local EXCLUSIVE prefix within the bucket; the paired rank asserts
    // orderCol's uniqueness (duplicate order keys make prefixes ambiguous)
    val wLocal = Window.partitionBy(col("__b")).orderBy(o)
    val local = bucketed
      .withColumn("__lp", coalesce(
        sum(v).over(wLocal.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn("__dup", count(lit(1)).over(
        Window.partitionBy(col("__b"), o)))

    val bsum = bucketed.groupBy(col("__b")).agg(sum(v).as("__bs"))
    val wCum = Window.orderBy(col("__b")).rowsBetween(Window.unboundedPreceding, -1)
    // the unpartitioned window runs over ≤ buckets summary rows — asserted
    val prior = bsum.withColumn("__off",
      coalesce(sum(Bounded.guard(col("__bs"),
        col("__b") >= 0 && col("__b") < buckets,
        s"exclusivePrefixSum: bucket id outside [0, $buckets) — summary window unbounded")
      ).over(wCum), lit(0L)))

    local
      .join(broadcast(prior.select(col("__b"), col("__off"))), Seq("__b"))
      .withColumn(prefixCol,
        Bounded.guard(col("__lp") + col("__off"), col("__dup") === 1,
          s"exclusivePrefixSum: duplicate $orderCol values — the order must be total"))
      .drop("__b", "__lp", "__dup", "__off")
  }
}
