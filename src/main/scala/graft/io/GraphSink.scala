package graft.io

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Graph sinks (SURVEY.md §2.1 S6-S11).
  *
  * The reference upserts documents one HTTP round-trip at a time into ArangoDB
  * (OntologyGraphBuilder.java:242-279, 445-484); the Spark-native equivalent
  * is a bulk columnar write: vertices partitioned by collection id, edges by
  * collection pair — the same "collection" layout as directories, readable
  * back with partition pruning (`filter(col("id") === "CL")` prunes to one
  * directory). Database overwrite (delete-then-recreate,
  * OntologyGraphBuilder.java:510-517) = SaveMode.Overwrite.
  */
object GraphSink {

  /** S8: vertex store. One parquet table partitioned by collection id. */
  def writeVertices(vertices: DataFrame, outDir: String): Unit =
    vertices.write.mode(SaveMode.Overwrite).partitionBy("id").parquet(s"$outDir/vertices")

  /** S9: edge store, partitioned by (from_id, to_id) — the reference's
    * "{from}-{to}" edge collections (ArangoDbUtilities.java:187).
    */
  def writeEdges(edges: DataFrame, outDir: String): Unit =
    edges.write.mode(SaveMode.Overwrite).partitionBy("from_id", "to_id").parquet(s"$outDir/edges")

  /** S8 at scale: bucketed vertex table — bucketBy the graph key so repeated
    * upserts/joins on (id, number) are co-located and plan WITHOUT a shuffle
    * exchange (verified in GraphSinkSpec). Requires a catalog table (bucket
    * metadata lives in the metastore).
    */
  def writeVerticesBucketed(vertices: DataFrame, table: String, numBuckets: Int): Unit =
    vertices.write.mode(SaveMode.Overwrite).format("parquet")
      .bucketBy(numBuckets, "id", "number")
      .sortBy("id", "number")
      .saveAsTable(table)

  /** S6: deprecated-terms text sink — `id_number` lines
    * (reference: OntologyGraphBuilder.java:246-259). Sorted for determinism
    * (the reference iterates HashMaps).
    */
  def writeDeprecatedTerms(deprecated: DataFrame, outDir: String): Unit =
    deprecated
      .select(concat_ws("_", col("id"), col("number")).as("value"))
      .orderBy("value")
      .coalesce(1)
      .write.mode(SaveMode.Overwrite).text(s"$outDir/deprecated_terms.txt")

  /** S7: edge-label map text sink — `raw: NORMALIZED` lines
    * (reference: OntologyGraphBuilder.java:556-562).
    */
  def writeEdgeLabels(labels: DataFrame, outDir: String): Unit =
    labels
      .select(concat(col("raw_label"), lit(": "), col("normalized")).as("value"))
      .orderBy("value")
      .coalesce(1)
      .write.mode(SaveMode.Overwrite).text(s"$outDir/edge_labels.txt")

  /** S8/S9 upsert-as-merge: engine-native upsert of `updates` into `current`
    * on `keys` — full-outer join + column-wise coalesce(update, current),
    * i.e. insert-if-absent / overwrite-if-present, the batch equivalent of
    * the reference's per-document get→insert-or-update loop
    * (OntologyGraphBuilder.java:242-279). Both sides shuffle on the key —
    * at scale, pre-bucketing either side by the same keys removes the
    * exchange.
    */
  def upsert(current: DataFrame, updates: DataFrame, keys: Seq[String]): DataFrame = {
    val cur = current.select(current.columns.toIndexedSeq.map(c =>
      if (keys.contains(c)) col(c) else col(c).as(s"__cur_$c")): _*)
    val upd = updates.select(updates.columns.toIndexedSeq.map(c =>
      if (keys.contains(c)) col(c) else col(c).as(s"__upd_$c")): _*)
    val merged = cur.join(upd, keys, "full_outer")
    val valueCols = current.columns.filterNot(keys.contains)
    merged.select(keys.map(col) ++ valueCols.map(c =>
      coalesce(col(s"__upd_$c"), col(s"__cur_$c")).as(c)): _*)
  }

  /** S11: bulk export of one vertex collection as JSON
    * (reference: export-arangodb.sh:3-11 exports collection CL).
    */
  def exportCollection(spark: SparkSession, graphDir: String, id: String, outDir: String): Unit =
    spark.read.parquet(s"$graphDir/vertices")
      .filter(col("id") === id)
      .write.mode(SaveMode.Overwrite).json(outDir)
}
