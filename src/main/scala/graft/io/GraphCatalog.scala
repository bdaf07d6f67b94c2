package graft.io

import org.apache.spark.sql.SparkSession

/** S10: idempotent database/graph/collection DDL
  * (reference: ArangoDbUtilities.java:80-212). A "database" is a directory of
  * parquet collection tables; create-or-get/delete map to filesystem ops plus
  * catalog view registration so collections are queryable by name via
  * `spark.sql`.
  */
object GraphCatalog {

  /** Create-or-get a graph database directory. Idempotent. */
  def createOrGetDatabase(dir: String): String = {
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(dir))
    dir
  }

  /** Delete a graph database (reference deleteDatabase — ignore-if-absent). */
  def deleteDatabase(dir: String): Unit = {
    val f = new java.io.File(dir)
    if (f.exists()) org.apache.commons.io.FileUtils.deleteDirectory(f)
  }

  /** Register a written graph store's tables as catalog views:
    * `<prefix>_vertices` / `<prefix>_edges`, queryable via spark.sql.
    */
  def registerGraph(spark: SparkSession, graphDir: String, prefix: String): Unit = {
    spark.read.parquet(s"$graphDir/vertices").createOrReplaceTempView(s"${prefix}_vertices")
    spark.read.parquet(s"$graphDir/edges").createOrReplaceTempView(s"${prefix}_edges")
  }

  /** Drop the registered views (idempotent). */
  def dropGraph(spark: SparkSession, prefix: String): Unit = {
    spark.catalog.dropTempView(s"${prefix}_vertices")
    spark.catalog.dropTempView(s"${prefix}_edges")
    ()
  }

  /** Edge collection name for a vertex-id pair — "{from}-{to}"
    * (reference: ArangoDbUtilities.java:187).
    */
  def edgeCollectionName(fromId: String, toId: String): String = s"$fromId-$toId"

  // --- collection-granular DDL (reference: ArangoDbUtilities.java:115-212) --
  // A collection is one partition directory of the graph store
  // (vertices/id=<name>, edges/from_id=<f>/to_id=<t>), so create-or-get is a
  // mkdir and delete is a single directory removal — partition-pruned, never
  // a rewrite of the other collections' data. This is what keeps per-
  // collection ops O(collection) instead of O(graph) at scale.
  // Partition VALUES go through Spark's path escaping (escapePathName) so
  // these ops agree with directories written by DataFrame.write.partitionBy
  // even for names containing '/', ':', spaces, etc.

  private def esc(v: String): String =
    org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils.escapePathName(v)
  private def unesc(v: String): String =
    org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils.unescapePathName(v)

  /** Create-or-get a vertex collection partition. Idempotent; returns path. */
  def createOrGetVertexCollection(graphDir: String, name: String): String = {
    val p = java.nio.file.Paths.get(graphDir, "vertices", s"id=${esc(name)}")
    java.nio.file.Files.createDirectories(p)
    p.toString
  }

  /** Delete one vertex collection — drops only its partition directory
    * (reference deleteVertexCollection with dropCollection=true). Falls back
    * to the raw (unescaped) directory name for stores written before
    * partition-value escaping.
    */
  def deleteVertexCollection(graphDir: String, name: String): Unit =
    Seq(esc(name), name).distinct.foreach { n =>
      val f = new java.io.File(s"$graphDir/vertices/id=$n")
      if (f.exists()) org.apache.commons.io.FileUtils.deleteDirectory(f)
    }

  /** Create-or-get the "{from}-{to}" edge collection partition. */
  def createOrGetEdgeCollection(graphDir: String, fromId: String, toId: String): String = {
    val p = java.nio.file.Paths.get(graphDir, "edges",
      s"from_id=${esc(fromId)}", s"to_id=${esc(toId)}")
    java.nio.file.Files.createDirectories(p)
    p.toString
  }

  /** Delete one edge collection partition (reference deleteEdgeCollection
    * with dropCollections=true). Same raw-name fallback as the vertex form.
    */
  def deleteEdgeCollection(graphDir: String, fromId: String, toId: String): Unit =
    Seq((esc(fromId), esc(toId)), (fromId, toId)).distinct.foreach { case (f0, t0) =>
      val f = new java.io.File(s"$graphDir/edges/from_id=$f0/to_id=$t0")
      if (f.exists()) org.apache.commons.io.FileUtils.deleteDirectory(f)
    }

  /** Vertex collection names present in the store (partition listing). */
  def listVertexCollections(graphDir: String): Seq[String] = {
    val d = new java.io.File(s"$graphDir/vertices")
    if (!d.exists()) Nil
    else d.listFiles().toSeq.filter(_.isDirectory).map(_.getName)
      .filter(_.startsWith("id=")).map(n => unesc(n.stripPrefix("id="))).sorted
  }

  /** Edge collection "{from}-{to}" names present in the store. */
  def listEdgeCollections(graphDir: String): Seq[String] = {
    val d = new java.io.File(s"$graphDir/edges")
    if (!d.exists()) Nil
    else (for {
      fd <- d.listFiles().toSeq.filter(_.isDirectory) if fd.getName.startsWith("from_id=")
      td <- fd.listFiles().toSeq.filter(_.isDirectory) if td.getName.startsWith("to_id=")
    } yield edgeCollectionName(unesc(fd.getName.stripPrefix("from_id=")),
      unesc(td.getName.stripPrefix("to_id=")))).sorted
  }
}
