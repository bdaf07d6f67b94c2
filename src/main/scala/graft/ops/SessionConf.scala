package graft.ops

import org.apache.spark.sql.SparkSession

/** Scoped session-conf swap for per-workload sizing (the one mechanism
  * behind the streaming twins' state-partition sizing and the iterative
  * graph entries' tiny-round sizing): set, run, restore. Only sound
  * around work that EXECUTES inside `body` (eager loops, started streams)
  * — a lazily returned plan executes after the restore.
  */
object SessionConf {

  /** One scope active per session at a time: the swap mutates SHARED
    * session state, so two concurrent scopes would race and could restore
    * a stale value — silently resizing every later shuffle. The registry
    * runs entries serially; this makes that assumption executable instead
    * of a comment (concurrent callers fail loudly here, never corrupt the
    * session conf).
    */
  private val active =
    java.util.Collections.newSetFromMap(
      new java.util.concurrent.ConcurrentHashMap[SparkSession, java.lang.Boolean]())

  def withShufflePartitions[T](s: SparkSession, n: Int)(body: => T): T = {
    require(active.add(s),
      "SessionConf: a scoped shuffle-partitions swap is already active on " +
        "this session — scopes mutate shared conf and must run serially")
    val key = "spark.sql.shuffle.partitions"
    val prev = s.conf.get(key)
    s.conf.set(key, n.toString)
    try body finally {
      s.conf.set(key, prev)
      active.remove(s)
    }
  }
}
