package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bounded graph traversal over an edge table: BFS level propagation
  * (min-hop distance from a source set, up to `maxHops`) — the k-hop
  * neighborhood query a graph-database user runs against the stored
  * property graph (the reference loads its graph into a traversal-capable
  * store; this is that query surface expressed relationally).
  *
  * Iterative frontier expansion: each round joins the current frontier
  * against the edge table, anti-joins the already-visited set (so every
  * node is labeled with its FIRST — minimum — hop count), and stops early
  * when the frontier empties. Rounds are bounded by `maxHops`, lineage is
  * truncated per round with eager `localCheckpoint` (same discipline as
  * [[ConnectedComponents]]; on a multi-executor cluster prefer reliable
  * checkpoints).
  *
  * Scale notes (100 TB): the per-round work is ONE equi-join shuffle on the
  * frontier key (broadcast when the frontier is small — the common case for
  * seed sets) plus one anti-join against visited. The visited set grows
  * monotonically; at billion-node scale pre-bucket `edges` by `srcCol` so
  * every round's join reuses the bucketing instead of reshuffling the edge
  * table (the dominant cost — the edge table is the 100 TB side and arrives
  * partitioned once).
  */
object GraphTraversal {

  /** (id, level) for every node within `maxHops` directed hops of
    * `sources` (a 1-column DataFrame named `idCol`); level = min hop count,
    * sources at level 0. Unreached nodes are absent.
    */
  def bfsLevels(edges: DataFrame, sources: DataFrame, maxHops: Int,
                srcCol: String = "src", dstCol: String = "dst",
                idCol: String = "id"): DataFrame = {
    require(maxHops >= 0, "maxHops must be >= 0")
    val e = edges.select(col(srcCol).as("id"), col(dstCol).as("nid"))
    var visited = sources.select(col(idCol).as("id")).distinct()
      .withColumn("level", lit(0)).localCheckpoint(true)
    var frontier = visited.select("id")
    var h = 0
    var exhausted = false
    while (h < maxHops && !exhausted) {
      h += 1
      val next = e.join(frontier, Seq("id"))
        .select(col("nid").as("id")).distinct()
        .join(visited.select("id"), Seq("id"), "left_anti")
        .withColumn("level", lit(h))
        .localCheckpoint(true)
      if (next.isEmpty) exhausted = true
      else {
        visited = visited.union(next).localCheckpoint(true)
        frontier = next.select("id")
      }
    }
    visited
  }
}
