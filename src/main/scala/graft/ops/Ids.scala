package graft.ops

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Stable dense id assignment — the vocabulary-indexing primitive every
  * training pipeline needs (token → id, label → id, uri → id) and the
  * dictionary-encoding step the graph operators use internally
  * ([[GraphTraversal]] pageRank/LPA encode string keys to longs with it).
  *
  * `id` = rank of the key in ascending key order: deterministic across
  * runs and partitionings (no `monotonically_increasing_id`, whose values
  * depend on physical partition layout). Distributed as a RANGE-partitioned
  * sort + per-partition index assignment with partition-count offsets
  * (`zipWithIndex`) — no single-partition global sort; the RDD hop is the
  * per-partition imperative step Catalyst has no operator for.
  */
object Ids {

  /** (`keyCol`, `idCol` LONG) — one row per DISTINCT key, id = 0-based
    * dense ascending-order rank. Pass `assumeDistinct = true` when the
    * input is already key-unique (the graph encoders' case) to skip the
    * pre-sort dedup exchange.
    */
  def denseIds(keys: DataFrame, keyCol: String, idCol: String = "id",
               assumeDistinct: Boolean = false): DataFrame = {
    require(keyCol != idCol, s"denseIds: key and id column names collide: $keyCol")
    val spark = keys.sparkSession
    val uniq = if (assumeDistinct) keys.select(col(keyCol))
               else keys.select(col(keyCol)).distinct()
    val sorted = uniq.orderBy(col(keyCol))
    val schema = StructType(Seq(
      sorted.schema.fields(0),
      StructField(idCol, LongType, nullable = false)))
    spark.createDataFrame(
      sorted.rdd.zipWithIndex().map { case (r, i) => Row(r.get(0), i) },
      schema)
  }
}
