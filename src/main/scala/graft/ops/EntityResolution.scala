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
    * the INPUT rows, before pairing — one input-scale count aggregate
    * joined back to the probe side, so an oversized block fails BEFORE its
    * pairs materialize. (The original guard counted over the PAIR stream
    * with a block-partitioned window: wall-neutral at bench SF — the
    * window rode the join's existing hash partitioning and JW scoring
    * dominates — but it validated a property of the linear input on the
    * quadratic pair table, and a detonating block would finish exploding
    * before tripping. The sizes frame is block-key cardinality — tiny by
    * construction — so it carries an explicit `broadcast()` hint: the
    * post-aggregate stats otherwise made the planner shuffle the probe
    * side a second time, a measured 1.6× wall regression at bench SF.)
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
    val aGuarded = maxBlockRows match {
      case Some(max) =>
        val sizes = df.groupBy(blockCols.map(col): _*)
          .agg(count(lit(1)).as("__er_n"))
        a.join(broadcast(sizes), blockCols)
          .withColumn("key_a", Bounded.guard(col("key_a"), col("__er_n") <= max,
            s"blockedNamePairs: a block exceeds maxBlockRows=$max rows " +
              "— re-block or pre-split the key"))
          .drop("__er_n")
      case None => a
    }
    aGuarded.join(b, blockCols).filter(col("key_a") < col("key_b"))
      .withColumn("sim", JaroWinkler.jaroWinkler(col("name_a"), col("name_b")))
      .filter(col("sim") >= minSim)
  }

  /** SORTED-NEIGHBORHOOD entity resolution — the scalable fallback when
    * every available blocking key has FIXED cardinality (brands,
    * categories, size codes), so block sizes grow ∝N and
    * [[blockedNamePairs]]'s within-block pairing grows ∝N² no matter how
    * the keys compose. Measured at 10× bench data (round-13 headroom
    * probe, PLANS.md): brand-blocked pairing went 20 s → 1090 s — a real
    * cliff, guard-bounded but quadratic by construction.
    *
    * The classic fix (Hernández & Stolfo 1995): within each block, SORT
    * by the match field and score only pairs ≤ `window` positions apart —
    * cost Σ|block|·w (LINEAR in N at fixed w), recall = near-duplicates
    * that sort adjacently, which Jaro-Winkler's prefix-weighted
    * similarity makes the common case. Determinism: sort ties break on
    * `keyCol`; every pair emits once with `key_a` the earlier row in sort
    * order.
    *
    * Scale shape (100 TB): one window rank per block (a key-partitioned
    * sort — no global window), then the pair space materializes by
    * EXPLODING each row into `window` probe ranks and equi-joining on
    * (block, rank): a plain shuffle join on bounded fan-out, never a
    * block × block product. AQE handles block skew; no driver state.
    */
  def sortedNeighborhoodPairs(df: DataFrame, blockCols: Seq[String],
                              keyCol: String, nameCol: String, minSim: Double,
                              window: Int): DataFrame = {
    require(blockCols.nonEmpty, "sortedNeighborhoodPairs needs a blocking column")
    require(window >= 1, s"window must be >= 1: $window")
    require(minSim >= 0.0 && minSim <= 1.0, s"minSim must be in [0,1]: $minSim")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(blockCols.map(col): _*)
      .orderBy(col(nameCol), col(keyCol))
    val ranked = df.select(
        blockCols.map(col) :+ col(keyCol) :+ col(nameCol): _*)
      .withColumn("__rn", row_number().over(w))
    val probes = ranked.select(
        blockCols.map(col) :+ col(keyCol).as("key_a") :+
          col(nameCol).as("name_a") :+ col("__rn"): _*)
      .withColumn("__j", explode(lit((1 to window).toArray)))
      .withColumn("__rn", col("__rn") + col("__j"))
      .drop("__j")
    val base = ranked.select(
      blockCols.map(col) :+ col(keyCol).as("key_b") :+
        col(nameCol).as("name_b") :+ col("__rn"): _*)
    probes.join(base, blockCols :+ "__rn")
      .drop("__rn")
      .withColumn("sim", JaroWinkler.jaroWinkler(col("name_a"), col("name_b")))
      .filter(col("sim") >= minSim)
  }
}
