package graft.llm

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding merge training and tokenization — the
  * vocabulary-construction step of a tokenizer pipeline, run where the
  * corpus lives instead of shipping text to a separate trainer.
  *
  * Scale shape (the part that matters at 100 TB): the corpus is scanned
  * ONCE into a (word, count) frequency table — vocabulary-sized, millions
  * of rows at web scale, not corpus-sized — and every merge iteration runs
  * on that table alone: one map-combinable pair-count aggregate over the
  * vocabulary, one driver-side argmax of a tiny (pair, total) result, one
  * map-side merge rewrite. Iteration state is checkpointed per round via
  * the pluggable [[graft.ops.Checkpointer]] (vocabulary-sized — cheap; the
  * same lineage-truncation discipline as
  * [[graft.ops.ConnectedComponents]]; Auto upgrades to reliable
  * checkpoints once a checkpoint dir is configured — essential here, since
  * a 32k-merge training loop on a cluster WILL see an executor loss).
  *
  * Determinism: ties on pair frequency break lexicographically on
  * (left, right), so the learned merge sequence is identical on any
  * engine, partitioning, or cluster size.
  */
object Bpe {

  /** The merge-application kernel: greedy left-to-right single-pass merge
    * of adjacent (left, right) into `left+right` — the classic BPE rewrite
    * ("aaa" under (a,a) merges the FIRST pair, yielding ["aa","a"]). A UDF
    * by necessity: the scan carries sequential state (a merged symbol may
    * not re-merge with the next element in the same round), which no
    * builtin array function expresses.
    */
  private[llm] def mergeOnce(symbols: Seq[String], left: String, right: String): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var i = 0
    while (i < symbols.length) {
      if (i + 1 < symbols.length && symbols(i) == left && symbols(i + 1) == right) {
        out += left + right
        i += 2
      } else {
        out += symbols(i)
        i += 1
      }
    }
    out.toSeq
  }

  /** Learn `numMerges` BPE merge rules from the corpus. Returns the rule
    * table (rank 0-based, left, right, merged, pair_count) in learned
    * order. Training stops early when no adjacent pair occurs twice.
    */
  def trainMerges(docs: DataFrame, numMerges: Int,
                  textCol: String = "text",
                  cp: graft.ops.Checkpointer = graft.ops.Checkpointer.Auto): Seq[(Int, String, String, String, Long)] = {
    require(numMerges > 0, s"numMerges must be positive: $numMerges")
    // ONE corpus pass: word frequency table with initial per-char symbols
    var vocab = cp(docs
      .select(explode(split(coalesce(col(textCol), lit("")), " ")).as("word"))
      .filter(col("word") =!= "")
      .groupBy("word").agg(count(lit(1)).as("n"))
      .select(split(col("word"), "").as("symbols"), col("n")))
    val mergeUdf = udf((symbols: Seq[String], l: String, r: String) => mergeOnce(symbols, l, r))
    val rules = scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, String, Long)]
    var rank = 0
    var exhausted = false
    while (rank < numMerges && !exhausted) {
      // adjacent pair counts over the vocabulary, weighted by word frequency
      val top = vocab
        .select(posexplode(slice(col("symbols"), lit(1), size(col("symbols")) - 1))
            .as(Seq("i", "left")),
          col("symbols"), col("n"))
        .select(col("left"), element_at(col("symbols"), col("i") + 2).as("right"), col("n"))
        .groupBy("left", "right").agg(sum(col("n")).as("total"))
        .filter(col("total") >= 2)
        .orderBy(col("total").desc, col("left"), col("right"))
        .limit(1)
        .collect()
      if (top.isEmpty) exhausted = true
      else {
        val l = top(0).getString(0)
        val r = top(0).getString(1)
        val t = top(0).getLong(2)
        rules += ((rank, l, r, l + r, t))
        // checkpoint the new round, then release the superseded copy —
        // otherwise numMerges (often tens of thousands) vocabulary copies
        // accumulate in non-evictable block storage over the training loop
        val prev = vocab
        vocab = cp(vocab
          .withColumn("symbols", mergeUdf(col("symbols"), lit(l), lit(r))))
        cp.release(prev)
        rank += 1
      }
    }
    rules.toSeq
  }

  /** Learned rules as a DataFrame — the registry/bench surface. */
  def trainMergesDf(docs: DataFrame, numMerges: Int,
                    textCol: String = "text",
                    cp: graft.ops.Checkpointer = graft.ops.Checkpointer.Auto): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    trainMerges(docs, numMerges, textCol, cp)
      .toDF("rank", "left", "right", "merged", "pair_count")
  }

  /** Tokenize with a learned rule sequence — the standard BPE encode
    * (the min-rank loop every production tokenizer uses): repeatedly merge
    * the LOWEST-rank adjacent pair present in the word until none remains.
    * Per-word cost is proportional to the word, not the vocabulary — a
    * 32k-rule vocabulary must not mean 32k array scans per word on a
    * corpus-scale map path. New pairs created by a merge contain the
    * merged symbol, so in the common case (merged strings unambiguous
    * across rules) this reproduces an in-order rule replay exactly; where
    * two rules yield the same merged string the min-rank loop is the
    * canonical semantics. Pure function of (text, rules); exposed as a
    * map-side UDF column.
    */
  def tokenize(merges: Seq[(String, String)]): org.apache.spark.sql.expressions.UserDefinedFunction = {
    val rank: Map[(String, String), Int] = merges.zipWithIndex.toMap
    udf { (text: String) =>
      if (text == null) Seq.empty[String]
      else text.split(" ").filter(_.nonEmpty).toSeq.flatMap { w =>
        var symbols: Seq[String] = w.split("").toSeq
        var done = false
        while (!done && symbols.length >= 2) {
          var bestRank = Int.MaxValue
          var i = 0
          while (i < symbols.length - 1) {
            val p = rank.getOrElse((symbols(i), symbols(i + 1)), Int.MaxValue)
            if (p < bestRank) bestRank = p
            i += 1
          }
          if (bestRank == Int.MaxValue) done = true
          else {
            val (l, r) = merges(bestRank)
            symbols = mergeOnce(symbols, l, r)
          }
        }
        symbols
      }
    }
  }
}
