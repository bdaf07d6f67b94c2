package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic sampling, split assignment, and sequence packing for
  * training-data pipelines.
  *
  * All randomness is content-hash-derived (md5 of the row's id plus a salt):
  * the same row always lands in the same split/sample regardless of
  * partitioning, cluster size, or engine — reproducible train/val/test
  * membership is a correctness property for training corpora, and Spark's
  * `sample()`/`sampleBy()` (seeded per-partition RNG) cannot provide it.
  * Everything is a narrow map-side transform: zero shuffles.
  *
  * Thresholds compare 8-hex-char md5 prefixes LEXICOGRAPHICALLY — on
  * fixed-width lowercase hex that equals numeric order (the MinHash trick),
  * so no engine-specific hex→int conversion is needed and any md5-capable
  * engine reproduces membership bit-for-bit.
  */
object Sampling {

  /** Fraction → 8-hex threshold: keep iff md5-prefix < threshold. Fraction
    * 1.0 returns "g", which sorts after every hex string — keeps ALL rows
    * (a "ffffffff" cap would drop the one-in-2^32 key equal to it).
    */
  def hexThreshold(fraction: Double): String = {
    require(fraction >= 0.0 && fraction <= 1.0, s"fraction must be in [0,1]: $fraction")
    if (fraction == 1.0) "g"
    else f"${(fraction * 4294967296.0).toLong}%08x"
  }

  /** The row's deterministic 8-hex sampling key. `idCol` should be a string
    * or integral column: integral→string casts render identically across
    * engines, while float/double formatting does not — hash a stable id,
    * never a measurement.
    */
  def hashKey(idCol: Column, salt: String): Column =
    substring(md5(concat(lit(salt), lit(":"), idCol.cast("string"))), 1, 8)

  /** Train/val/test (or any K-way) split assignment: `cuts` are cumulative
    * fractions with their labels, e.g.
    * `Seq(0.8 -> "train", 0.9 -> "val", 1.0 -> "test")` (must be
    * monotonically increasing, last = 1.0). Adds `splitCol` with the label.
    */
  def assignSplit(df: DataFrame, idCol: String, cuts: Seq[(Double, String)],
                  salt: String = "split", splitCol: String = "split"): DataFrame = {
    require(cuts.nonEmpty && cuts.last._1 == 1.0, "last cut must be 1.0")
    require(cuts.map(_._1) == cuts.map(_._1).sorted, "cuts must be increasing")
    val key = hashKey(col(idCol), salt)
    val labeled = cuts.init.foldRight(lit(cuts.last._2)) { case ((frac, label), rest) =>
      when(key < lit(hexThreshold(frac)), lit(label)).otherwise(rest)
    }
    df.withColumn(splitCol, labeled)
  }

  /** Deterministic uniform sample: keep each row iff its hash key falls
    * under `fraction`. Same contract as `df.sample` but reproducible and
    * partitioning-independent.
    */
  def deterministicSample(df: DataFrame, idCol: String, fraction: Double,
                          salt: String = "sample"): DataFrame =
    df.filter(hashKey(col(idCol), salt) < lit(hexThreshold(fraction)))

  /** Stratified deterministic sample: per-stratum keep rates (e.g. a target
    * domain mix — downsample common-crawl, keep all of books). Strata absent
    * from `rates` use `defaultRate`. The rate lookup is a literal when-chain
    * (broadcast-free, codegen'd); membership is as reproducible as
    * [[deterministicSample]].
    */
  def stratifiedSample(df: DataFrame, idCol: String, stratumCol: String,
                       rates: Map[String, Double], defaultRate: Double = 1.0,
                       salt: String = "strata"): DataFrame = {
    val threshold = rates.toSeq.sortBy(_._1).foldRight(lit(hexThreshold(defaultRate))) {
      case ((stratum, rate), rest) =>
        when(col(stratumCol) === lit(stratum), lit(hexThreshold(rate))).otherwise(rest)
    }
    df.filter(hashKey(col(idCol), salt) < threshold)
  }

  /** Token-budget domain mixing: keep, per domain, a deterministic
    * pseudo-random prefix of documents whose token counts fill that domain's
    * budget (the "sample common-crawl down to N billion tokens, keep all of
    * books" step that turns a raw corpus into a training mix). Documents are
    * ordered by their salted content-hash key (reproducible on any engine /
    * partitioning, like every sampler here); a doc is kept iff it STARTS
    * before its domain's budget is exhausted, so each domain overshoots by
    * at most one document (the [[packSequences]] boundary convention).
    * Emits the kept rows plus `n_tokens` and `cum_tokens` (running domain
    * total through this doc).
    *
    * Scale shape: the naive form is one window over `partitionBy(domain)` —
    * a HANDFUL of fat keys, i.e. one reducer per domain sorting billions of
    * rows at 100 TB. Instead the hash key's first `bucketHexChars` chars
    * split every domain into 16^bucketHexChars ordered sub-buckets:
    * per-(domain, bucket) token sums are ONE map-combinable aggregate on a
    * tiny result; a window over that summary (thousands of rows) yields each
    * bucket's base offset; the per-doc running sum then runs inside
    * (domain, bucket) — fine-grained uniform keys — and adds the broadcast
    * base offset. Same answer as the flat window (bucket = key prefix, so
    * (bucket, key) order IS key order), but every shuffle is uniform.
    */
  def tokenBudgetMix(docs: DataFrame, idCol: String, domainCol: String,
                     tokensCol: Column, budgets: Map[String, Long],
                     defaultBudget: Long = Long.MaxValue, salt: String = "mix",
                     bucketHexChars: Int = 2): DataFrame = {
    require(bucketHexChars >= 1 && bucketHexChars <= 7,
      s"bucketHexChars must be in [1,7]: $bucketHexChars")
    val reserved = Seq("n_tokens", "cum_tokens", "mix_key", "mix_bucket", "base_tokens")
    require(!docs.columns.exists(reserved.contains),
      s"tokenBudgetMix: input already has one of ${reserved.mkString(", ")}")
    val base = docs
      .withColumn("mix_key", hashKey(col(idCol), salt))
      .withColumn("mix_bucket", substring(col("mix_key"), 1, bucketHexChars))
      .withColumn("n_tokens", tokensCol.cast("long"))
    val bucketSums = base.groupBy(col(domainCol), col("mix_bucket"))
      .agg(sum(col("n_tokens")).as("bucket_tokens"))
    val offsets = bucketSums
      .withColumn("base_tokens",
        coalesce(sum(col("bucket_tokens")).over(
          Window.partitionBy(col(domainCol)).orderBy(col("mix_bucket"))
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .drop("bucket_tokens")
    val inBucket = Window.partitionBy(col(domainCol), col("mix_bucket"))
      .orderBy(col("mix_key"), col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val budgetCol = budgets.toSeq.sortBy(_._1).foldRight(lit(defaultBudget)) {
      case ((domain, b), rest) => when(col(domainCol) === lit(domain), lit(b)).otherwise(rest)
    }
    base.join(broadcast(offsets), Seq(domainCol, "mix_bucket"))
      .withColumn("cum_tokens", col("base_tokens") + sum(col("n_tokens")).over(inBucket))
      .filter(col("cum_tokens") - col("n_tokens") < budgetCol)
      .drop("mix_key", "mix_bucket", "base_tokens")
  }

  /** Pack documents into fixed-capacity training sequences: docs are laid
    * out in (`shardCol`, order-by `idCol`) order and assigned
    * `pack_id = floor(preceding_tokens / capacity)` within their shard —
    * first-fit-in-order packing where a doc whose tokens straddle a boundary
    * goes to (and may overflow) the earlier pack. Overflow is bounded by one
    * doc; exact never-exceed-capacity packing needs a sequential scan per
    * shard (flatMapGroups) and loses the pure-window shape — at corpus scale
    * the bounded-overflow form is what sequence-packing pipelines use, and
    * it stays one shuffle on the shard key.
    * Emits the input plus `n_tokens` and `pack_id`.
    */
  def packSequences(docs: DataFrame, idCol: String, shardCol: String,
                    tokensCol: Column, capacity: Long): DataFrame = {
    require(capacity > 0, "capacity must be positive")
    require(!docs.columns.contains("n_tokens") && !docs.columns.contains("pack_id"),
      "packSequences: input already has an 'n_tokens' or 'pack_id' column")
    val w = Window.partitionBy(col(shardCol)).orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    docs
      .withColumn("n_tokens", tokensCol)
      .withColumn("pack_id",
        floor((sum(col("n_tokens")).over(w) - col("n_tokens")) / capacity))
  }

  /** End-to-end training-shard export: assign splits, shard by content
    * hash, pack into fixed-capacity sequences, and materialize as
    * `outDir/split=…/shard=…/part-*.parquet` with rows sorted by
    * (pack_id, id) inside every file — a reader streams whole packs
    * contiguously. The shard key derives from the same md5 machinery as
    * every sampler here, so the layout is reproducible on any engine or
    * cluster size.
    *
    * Scale shape: ONE algorithmic shuffle (the pack window on (split,
    * shard) keys — numShards × |cuts| uniform groups; scale parallelism by
    * raising numShards) feeding a repartition aligned with the directory
    * layout, so every write task produces exactly one partition directory;
    * `maxRecordsPerFile` bounds file sizes against skew.
    */
  def writeTrainingShards(docs: DataFrame, outDir: String, idCol: String,
                          tokensCol: Column, capacity: Long,
                          cuts: Seq[(Double, String)] = Seq(0.9 -> "train", 1.0 -> "val"),
                          numShards: Int = 8,
                          maxRecordsPerFile: Long = 0L): Unit = {
    require(numShards > 0 && numShards <= 65536,
      s"numShards must be in [1, 65536] (the shard key has 16 bits): $numShards")
    require(!docs.columns.exists(Seq("split", "shard").contains),
      "writeTrainingShards: input already has a 'split' or 'shard' column")
    val sharded = assignSplit(docs, idCol, cuts)
      .withColumn("shard",
        conv(substring(hashKey(col(idCol), "shard"), 1, 4), 16, 10)
          .cast("int") % numShards)
    // pack within (split, shard) so every emitted pack lives in one file
    val packed = packSequences(
      sharded.withColumn("shard_key", concat_ws("/", col("split"), col("shard"))),
      idCol, "shard_key", tokensCol, capacity).drop("shard_key")
    packed
      .repartition(col("split"), col("shard"))
      .sortWithinPartitions(col("pack_id"), col(idCol))
      .write
      .partitionBy("split", "shard")
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .mode(org.apache.spark.sql.SaveMode.Overwrite)
      .parquet(outDir)
  }
}
