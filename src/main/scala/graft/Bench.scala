package graft
import org.apache.spark.sql.SparkSession

/** Driver-run benchmark: every registry query on SPARK_GRAFT_SF_DIR, one
  * JSON line on stdout. Queries are forced through the noop sink so the full
  * plan executes (a bare count() would let Catalyst skip projected work).
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.GraftExtensions.register(spark)
    // session warm-up so the first timed query doesn't absorb JVM/codegen init
    spark.range(1000).selectExpr("sum(id)").collect()
    // optional args: query names to run (default all) — isolation/profiling aid
    val selected = if (args.nonEmpty) SparkEntry.queries.filter(q => args.contains(q._1))
                   else SparkEntry.queries
    val results = selected.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      val err = try { fn(spark, sfDir).write.mode("overwrite").format("noop").save(); None }
                catch { case e: Throwable => Some(e.toString.takeWhile(_ != '\n').take(200)) }
      (name, (System.nanoTime() - t0) / 1e9, err)
    }
    // failed queries are reported with negative elapsed time AND in an errors
    // map, so a crash can never masquerade as a fast success in bench totals
    val qs = results.map { case (k, v, err) =>
      "\"" + k + "\":" + (if (err.isDefined) -v else v)
    }.mkString("{", ",", "}")
    val errs = results.collect { case (k, _, Some(e)) =>
      "\"" + k + "\":\"" + e.replace("\\", "\\\\").replace("\"", "\\\"") + "\""
    }.mkString("{", ",", "}")
    val total = results.map(_._2).sum
    val json = s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"errors":$errs,"sf":"$sfDir"}"""
    // ONE bare line on the process's real stdout: java.io.FileDescriptor.out
    // bypasses sbt's System.out capture (whose "[info] " prefix breaks
    // line-oriented JSON parsing downstream) and IS System.out everywhere
    // else — never a duplicate. Plus a file copy at SPARK_GRAFT_BENCH_OUT
    // (default bench_out.json in cwd).
    val fd = new java.io.PrintStream(new java.io.FileOutputStream(java.io.FileDescriptor.out), true, "UTF-8")
    fd.println(json)
    val outPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "bench_out.json")
    try java.nio.file.Files.write(java.nio.file.Paths.get(outPath),
      (json + "\n").getBytes("UTF-8"))
    catch { case e: Throwable => System.err.println(s"bench: could not write $outPath: $e") }
    spark.stop()
  }
}
