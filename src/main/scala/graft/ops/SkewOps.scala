package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for hub-heavy joins (SURVEY §7.5: upper-ontology terms
  * like CL_0000000 appear as object in a large share of subClassOf edges).
  *
  * First line of defense is AQE's skew-join splitting (on by default, zero
  * code). This module is the documented fallback for cases AQE cannot split
  * (e.g. a build side that must broadcast partially, or pre-AQE shuffles):
  * classic key salting — replicate the small side `saltFactor` times, salt
  * the large side uniformly, join on (key, salt).
  */
object SkewOps {

  /** Equi-join `large ⋈ small` on `keys` with salting: the large side gets a
    * uniform random-free salt (hash of all columns mod factor — deterministic,
    * no RNG state), the small side is replicated once per salt value. Result
    * equals the plain inner join, but the shuffle spreads each hot key over
    * `saltFactor` reducers.
    */
  def saltedJoin(large: DataFrame, small: DataFrame, keys: Seq[String],
                 saltFactor: Int): DataFrame = {
    val salted = large.withColumn("__salt",
      pmod(xxhash64(large.columns.map(col).toIndexedSeq: _*), lit(saltFactor)).cast("int"))
    val replicated = small.withColumn("__salt",
      explode(sequence(lit(0), lit(saltFactor - 1))))
    salted.join(replicated, keys :+ "__salt").drop("__salt")
  }

  /** Per-key frequency profile — the diagnostic used to decide whether
    * salting is warranted: top-N keys by row count with their share.
    */
  def keySkewProfile(df: DataFrame, keys: Seq[String], topN: Int = 10): DataFrame = {
    val total = df.count()
    df.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("n"))
      .withColumn("share", col("n") / lit(total.toDouble))
      .orderBy(col("n").desc)
      .limit(topN)
  }
}
