package graft.ops

import graft.functions.JaroWinkler
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Blocked entity resolution — fuzzy record linkage in the blocking-join +
  * verify shape every dedup tier here uses: an equi-join on a BLOCKING key
  * bounds the quadratic candidate space to Σ|block|² (never corpus ×
  * corpus), then a similarity kernel scores only the surviving pairs.
  *
  * Scale shape (100 TB): the blocking join is a plain shuffle equi-join on
  * the block columns — Catalyst plans it like any key join, AQE handles
  * mild block skew. The quadratic term lives INSIDE blocks, so block-key
  * choice is the whole game: profile candidate volume with the
  * s15 key-skew machinery first, and pass `maxBlockRows` to fail loudly
  * (runtime-guarded per row, the [[Bounded]] discipline) when a degenerate
  * block would detonate the pair count — the d17 prefix-filter lesson, as
  * an executable invariant instead of a documented failure mode.
  */
object EntityResolution {

  /** Within-block name-pair scoring with [[JaroWinkler]]: one output row
    * per unordered candidate pair (`key_a` < `key_b`) whose similarity
    * reaches `minSim`. Input columns are `blockCols` (equality blocking
    * key), `keyCol` (unique id), `nameCol` (the fuzzy-matched string).
    *
    * `maxBlockRows`: optional per-block size bound enforced AT RUN TIME on
    * every candidate pair (a count-window per block key would cost a
    * second shuffle; the guard rides the pair stream for free and a single
    * oversized block fails the query with the block key in the message).
    */
  def blockedNamePairs(df: DataFrame, blockCols: Seq[String], keyCol: String,
                       nameCol: String, minSim: Double,
                       maxBlockRows: Option[Long] = None): DataFrame = {
    require(blockCols.nonEmpty, "blockedNamePairs needs at least one blocking column")
    require(minSim >= 0.0 && minSim <= 1.0, s"minSim must be in [0,1]: $minSim")
    val a = df.select(
      blockCols.map(col) :+ col(keyCol).as("key_a") :+ col(nameCol).as("name_a"): _*)
    val b = df.select(
      blockCols.map(col) :+ col(keyCol).as("key_b") :+ col(nameCol).as("name_b"): _*)
    val pairs = a.join(b, blockCols).filter(col("key_a") < col("key_b"))
    val guarded = maxBlockRows match {
      case Some(max) =>
        // a block of n rows emits n(n-1)/2 pairs; bounding the per-pair
        // count implicitly bounds n without a separate degree aggregate
        val cap = max * (max - 1L) / 2L
        val w = org.apache.spark.sql.expressions.Window.partitionBy(blockCols.map(col): _*)
        pairs.withColumn("er_pairs", count(lit(1)).over(w))
          .withColumn("key_a", Bounded.guard(col("key_a"), col("er_pairs") <= cap,
            s"blockedNamePairs: a block exceeds maxBlockRows=$max " +
              s"(> $cap candidate pairs) — re-block or pre-split the key"))
          .drop("er_pairs")
      case None => pairs
    }
    guarded
      .withColumn("sim", JaroWinkler.jaroWinkler(col("name_a"), col("name_b")))
      .filter(col("sim") >= minSim)
  }
}
