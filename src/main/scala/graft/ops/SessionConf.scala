package graft.ops

import org.apache.spark.sql.SparkSession

/** Scoped session-conf swap for per-workload sizing (the one mechanism
  * behind the streaming twins' state-partition sizing and the iterative
  * graph entries' tiny-round sizing): set, run, restore. Only sound
  * around work that EXECUTES inside `body` (eager loops, started streams)
  * — a lazily returned plan executes after the restore.
  */
object SessionConf {
  def withShufflePartitions[T](s: SparkSession, n: Int)(body: => T): T = {
    val key = "spark.sql.shuffle.partitions"
    val prev = s.conf.get(key)
    s.conf.set(key, n.toString)
    try body finally s.conf.set(key, prev)
  }
}
