package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** X1: full-text search analyzers and the search-view token table
  * (reference: ArangoDbUtilities.java:219-312). The reference delegates to
  * ArangoSearch's `n-gram` (min=3, max=4, preserveOriginal) and
  * `text_en_no_stem` (lowercase, no stem, edge-ngram 3..12, preserveOriginal)
  * analyzers plus a view mapping (collection, field) pairs; here the same
  * surface is a derived token DataFrame — scalable, incremental-friendly, and
  * joinable for search.
  */
object TextIndex {

  /** Character n-grams of `s` for n in [minN, maxN], plus the original when
    * `preserveOriginal` — the reference's "n-gram" analyzer semantics.
    * Implemented with sequence+transform: stays in whole-stage codegen.
    * Emits one array column; explode downstream.
    */
  def charNgrams(s: Column, minN: Int, maxN: Int, preserveOriginal: Boolean): Column = {
    val grams = (minN to maxN).map { n =>
      // guard: Spark's sequence(1, 0) descends instead of returning empty
      val hi = length(s) - (n - 1)
      val idxs = when(hi >= 1, sequence(lit(1), hi)).otherwise(array().cast("array<int>"))
      transform(idxs, i => s.substr(i, lit(n)))
    }
    val all = grams.reduce(concat(_, _))
    if (preserveOriginal) array_union(all, array(s)) else array_distinct(all)
  }

  /** Edge n-grams (prefixes) of each lowercased word, lengths [minN, maxN],
    * plus the whole word — the reference's `text_en_no_stem` analyzer
    * (locale en, lowercase, no accent folding beyond lowercase, no stemming,
    * edge-ngram 3..12, preserveOriginal).
    */
  def edgeNgramsPerWord(s: Column, minN: Int = 3, maxN: Int = 12): Column = {
    val words = split(lower(s), "\\s+")
    flatten(transform(words, w =>
      array_union(
        transform(sequence(lit(minN), greatest(least(length(w), lit(maxN)), lit(minN))),
          n => w.substr(lit(1), n)),
        array(w))))
  }

  /** Build the search token table for a set of (collection, field) links —
    * the engine's ArangoSearch view. `fieldsByCollection` mirrors the
    * collection-maps JSON consumed by createView
    * (ArangoDbUtilities.java:289-308; FIXTURES.md §5).
    *
    * Input `vertices`: (id, number, attrs map<string,array<string>>).
    * Output: (collection, key, field, analyzer, token) — partitioned/search-
    * able by token; at scale, write bucketed by token for point lookups.
    */
  def buildTokenTable(vertices: DataFrame, fieldsByCollection: Map[String, Seq[String]]): DataFrame = {
    val links = fieldsByCollection.toSeq
      .filterNot { case (c, _) => c == "edges" } // reference skips non-vertex entries
      .flatMap { case (c, fs) => fs.map(f => (c, f)) }
    val linkRows = links.map { case (c, f) => struct(lit(c).as("collection"), lit(f).as("field")) }
    if (linkRows.isEmpty) return vertices.sparkSession.emptyDataFrame

    val exploded = vertices
      .select(col("id").as("collection"), col("number").as("key"),
        explode(array(linkRows: _*)).as("link"), col("attrs"))
      .filter(col("collection") === col("link.collection"))
      .select(col("collection"), col("key"), col("link.field").as("field"),
        explode_outer(coalesce(col("attrs")(col("link.field")), array())).as("value"))
      .filter(col("value").isNotNull)

    val ngram = exploded.select(col("collection"), col("key"), col("field"),
      lit("n-gram").as("analyzer"),
      explode(charNgrams(col("value"), 3, 4, preserveOriginal = true)).as("token"))
    val edge = exploded.select(col("collection"), col("key"), col("field"),
      lit("text_en_no_stem").as("analyzer"),
      explode(edgeNgramsPerWord(col("value"))).as("token"))
    val identity = exploded.select(col("collection"), col("key"), col("field"),
      lit("identity").as("analyzer"), col("value").as("token"))

    ngram.union(edge).union(identity).distinct()
  }

  /** Search: exact token lookup against the token table (any analyzer). */
  def search(tokens: DataFrame, query: String): DataFrame =
    tokens.filter(col("token") === lower(lit(query)) || col("token") === lit(query))
      .select("collection", "key", "field", "analyzer").distinct()
}
