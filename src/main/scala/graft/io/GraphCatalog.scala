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
}
