package graft
import org.apache.spark.sql.SparkSession

/** Committed diagnostic main, outside the driver contract: run the
  * battery in bench order and sample the calibration workload + storage /
  * GC state every `stride` queries to locate a session-degradation
  * source. r16 observed end-of-battery calibration 18.45 s vs 3.48 s
  * fresh; the r17 re-run of this probe read a FLAT calibration
  * (1.4-2.0 s second reading at every stride), 14 MB total cached blocks,
  * and 7 s cumulative GC across the whole battery — adjudicating the r16
  * observation as external box load, not storage-memory pressure
  * (OPTIMIZATION_r17.md §degradation).
  */
object DegradeProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val stride = args.headOption.map(_.toInt).getOrElse(60)
    val spark = SparkSession.builder()
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.GraftExtensions.register(spark)
    def cal(): Double = {
      val t0 = System.nanoTime()
      spark.range(0L, 50000000L, 1L, 32)
        .selectExpr("id % 1000000 AS k", "id AS v")
        .groupBy("k").agg(org.apache.spark.sql.functions.sum("v").as("s"))
        .selectExpr("sum(s)").collect()
      (System.nanoTime() - t0) / 1e9
    }
    def gcMillis(): Long =
      java.lang.management.ManagementFactory.getGarbageCollectorMXBeans
        .stream().mapToLong(_.getCollectionTime).sum()
    def report(tag: String): Unit = {
      val sc = spark.sparkContext
      val rddInfo = sc.getRDDStorageInfo
      val mem = rddInfo.map(_.memSize).sum / 1e6
      val heapUsed = (Runtime.getRuntime.totalMemory - Runtime.getRuntime.freeMemory) / 1e6
      val nCached = rddInfo.length
      val c1 = cal(); val c2 = cal()
      println(f"PROBE $tag%-28s cal=$c1%.2f/$c2%.2f cachedRDDs=$nCached memStored=${mem}%.0fMB heap=${heapUsed}%.0fMB gc=${gcMillis()}ms")
    }
    spark.range(1000).selectExpr("sum(id)").collect()
    try graft.queries.PipelineQueries.warmSharedStores(spark, sfDir) catch { case e: Throwable => println(s"warm: $e") }
    try graft.queries.GraphQueries.warmShared(spark, sfDir) catch { case e: Throwable => () }
    try graft.queries.FlagshipQueries.warmStore(spark) catch { case e: Throwable => () }
    try graft.queries.PipelineQueries.warmHnswLayers(spark, sfDir) catch { case e: Throwable => () }
    try graft.queries.PipelineQueries.warmKnngAppendBase(spark, sfDir) catch { case e: Throwable => () }
    try graft.queries.StreamingQueries.warmStagedReplays(spark, sfDir) catch { case e: Throwable => () }
    report("after-warmup")
    val qs = SparkEntry.queries.toSeq.sortBy(_._1)
    var i = 0
    for ((name, fn) <- qs) {
      try fn(spark, sfDir).write.mode("overwrite").format("noop").save()
      catch { case e: Throwable => println(s"ERR $name: ${e.toString.take(120)}") }
      i += 1
      if (i % stride == 0) report(s"after-$i-$name")
    }
    report("end-of-battery")
    spark.stop()
  }
}
