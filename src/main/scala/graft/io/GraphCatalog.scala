package graft.io

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession

/** S10: idempotent database/graph/collection DDL
  * (reference: ArangoDbUtilities.java:80-212). A "database" is a directory of
  * parquet collection tables; create-or-get/delete map to filesystem ops plus
  * catalog view registration so collections are queryable by name via
  * `spark.sql`.
  *
  * All filesystem ops go through the Hadoop [[FileSystem]] resolved from the
  * store path's scheme — the store is written by Spark against any Hadoop FS
  * (hdfs://, s3a://, file:…), so DDL must address the same namespace; raw
  * java.io/NIO would silently operate on the local disk only.
  */
object GraphCatalog {

  /** Hadoop conf: the active session's (so fs.* settings apply), else fresh. */
  private def hadoopConf: Configuration =
    SparkSession.getActiveSession.map(_.sessionState.newHadoopConf())
      .getOrElse(new Configuration())

  private def fsFor(p: Path): FileSystem = p.getFileSystem(hadoopConf)

  /** Create-or-get a graph database directory. Idempotent. */
  def createOrGetDatabase(dir: String): String = {
    val p = new Path(dir)
    fsFor(p).mkdirs(p)
    dir
  }

  /** Delete a graph database (reference deleteDatabase — ignore-if-absent). */
  def deleteDatabase(dir: String): Unit = {
    val p = new Path(dir)
    val fs = fsFor(p)
    if (fs.exists(p)) fs.delete(p, true)
    ()
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

  /** The raw-name fallback (for stores written before partition-value
    * escaping) builds a path from the UNESCAPED collection name, so a name
    * containing a path separator or a '..' segment could resolve outside the
    * graph store; such names are never produced by partitionBy un-escaped, so
    * the fallback simply skips them rather than risk deleting a foreign path.
    */
  private def rawNameSafe(n: String): Boolean =
    !n.contains("/") && !n.contains("\\") && n != "." && n != ".."

  private def deleteDir(path: String): Unit = {
    val p = new Path(path)
    val fs = fsFor(p)
    if (fs.exists(p)) fs.delete(p, true)
    ()
  }

  /** Create-or-get a vertex collection partition. Idempotent; returns path. */
  def createOrGetVertexCollection(graphDir: String, name: String): String = {
    val p = new Path(graphDir, s"vertices/id=${esc(name)}")
    fsFor(p).mkdirs(p)
    p.toString
  }

  /** Delete one vertex collection — drops only its partition directory
    * (reference deleteVertexCollection with dropCollection=true). Falls back
    * to the raw (unescaped) directory name for stores written before
    * partition-value escaping, but only when that name is path-safe.
    */
  def deleteVertexCollection(graphDir: String, name: String): Unit =
    (esc(name) +: (if (rawNameSafe(name)) Seq(name) else Nil)).distinct.foreach { n =>
      deleteDir(s"$graphDir/vertices/id=$n")
    }

  /** Create-or-get the "{from}-{to}" edge collection partition. */
  def createOrGetEdgeCollection(graphDir: String, fromId: String, toId: String): String = {
    val p = new Path(graphDir, s"edges/from_id=${esc(fromId)}/to_id=${esc(toId)}")
    fsFor(p).mkdirs(p)
    p.toString
  }

  /** Delete one edge collection partition (reference deleteEdgeCollection
    * with dropCollections=true). Same guarded raw-name fallback as the
    * vertex form.
    */
  def deleteEdgeCollection(graphDir: String, fromId: String, toId: String): Unit = {
    val escaped = (esc(fromId), esc(toId))
    val raw =
      if (rawNameSafe(fromId) && rawNameSafe(toId)) Seq((fromId, toId)) else Nil
    (escaped +: raw).distinct.foreach { case (f0, t0) =>
      deleteDir(s"$graphDir/edges/from_id=$f0/to_id=$t0")
    }
  }

  /** Vertex collection names present in the store (partition listing). */
  def listVertexCollections(graphDir: String): Seq[String] = {
    val d = new Path(s"$graphDir/vertices")
    val fs = fsFor(d)
    if (!fs.exists(d)) Nil
    else fs.listStatus(d).toSeq.filter(_.isDirectory).map(_.getPath.getName)
      .filter(_.startsWith("id=")).map(n => unesc(n.stripPrefix("id="))).sorted
  }

  /** Edge collection "{from}-{to}" names present in the store. */
  def listEdgeCollections(graphDir: String): Seq[String] = {
    val d = new Path(s"$graphDir/edges")
    val fs = fsFor(d)
    if (!fs.exists(d)) Nil
    else (for {
      fd <- fs.listStatus(d).toSeq.filter(_.isDirectory)
      if fd.getPath.getName.startsWith("from_id=")
      td <- fs.listStatus(fd.getPath).toSeq.filter(_.isDirectory)
      if td.getPath.getName.startsWith("to_id=")
    } yield edgeCollectionName(unesc(fd.getPath.getName.stripPrefix("from_id=")),
      unesc(td.getPath.getName.stripPrefix("to_id=")))).sorted
  }
}
