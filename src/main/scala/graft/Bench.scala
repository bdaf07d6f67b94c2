package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.util.QueryExecutionListener

/** Driver-run benchmark: every registry query on SPARK_GRAFT_SF_DIR, one
  * COMPACT JSON line on stdout (the driver tails a bounded window of stdout;
  * an 80-query map overflows it, so per-query timings and observed metrics
  * go to the bench_out.json file — SPARK_GRAFT_BENCH_OUT — instead).
  * Queries are forced through the noop sink so the full plan executes (a
  * bare count() would let Catalyst skip projected work).
  */
object Bench {

  /** JSON string escape for names/messages — backslash, quote, and ALL
    * control chars (< 0x20): an embedded newline/tab in an error message or
    * string metric would otherwise break the line-oriented JSON parser.
    */
  private def jstr(s: String): String = "\"" + s.flatMap {
    case '"'  => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  } + "\""

  /** JSON-safe rendering of an observed-metric value: numbers bare (but
    * NaN/Infinity quoted — bare they are invalid JSON), everything else as
    * an escaped string. All current metrics are longs; this guards the day
    * one isn't.
    */
  private def jval(v: Any): String = v match {
    case null => "null"
    case b: Boolean => b.toString
    case d: Double if java.lang.Double.isFinite(d) => d.toString
    case f: Float if java.lang.Float.isFinite(f) => f.toString
    case n @ (_: Byte | _: Short | _: Int | _: Long) => n.toString
    case bd: java.math.BigDecimal => bd.toString
    case bd: BigDecimal => bd.toString
    case other => jstr(String.valueOf(other))
  }

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

    // Observed metrics (the silent-cap audit trail: jaccard_maxdf_*,
    // lsh_maxbucket_*, neardup_maxdf_* drop counts) are delivered via the
    // async ExecutionListener bus; collect them into one map keyed by their
    // globally-unique names and attribute to queries by key-set diffing.
    // The bus is DRAINED between queries (GraftListenerBridge) so the diff
    // is exact — a bounded poll alone raced: a metric arriving after the
    // poll deadline landed in the NEXT query's diff.
    val observed = new java.util.concurrent.ConcurrentHashMap[String, String]()
    spark.listenerManager.register(new QueryExecutionListener {
      override def onSuccess(funcName: String, qe: QueryExecution, durationNs: Long): Unit =
        qe.observedMetrics.foreach { case (name, row) =>
          val fields = row.schema.fieldNames.zipWithIndex.map { case (f, i) =>
            jstr(f) + ":" + jval(row.get(i))
          }
          observed.put(name, fields.mkString("{", ",", "}"))
        }
      override def onFailure(funcName: String, qe: QueryExecution, ex: Exception): Unit = ()
    })

    // session warm-up so the first timed query doesn't absorb JVM/codegen init
    spark.range(1000).selectExpr("sum(id)").collect()
    // optional args: query names to run (default all) — isolation/profiling aid
    val selected = if (args.nonEmpty) SparkEntry.queries.filter(q => args.contains(q._1))
                   else SparkEntry.queries
    // Attribution contract: only queries whose plans carry CollectMetrics
    // can contribute to `observed`, so only THOSE pay a bus drain — once
    // before their snapshot (flushes any straggler event from earlier
    // queries out of the diff window) and once after execution (their own
    // events land before the diff). Draining after EVERY query would
    // serialize the bench against the appStatus queue, which lags seconds
    // behind task-heavy queries — measured as a ~2x whole-suite slowdown.
    val results = selected.toSeq.sortBy(_._1).map { case (name, fn) =>
      // plan construction, metric detection, and the pre-drain all happen
      // BEFORE t0: the pre-drain can absorb a multi-second appStatus
      // backlog from an earlier task-heavy query, and that wait is bus
      // bookkeeping, not this query's work
      var drainedOk = true
      val prep: Either[String, (org.apache.spark.sql.DataFrame, Boolean)] = try {
        val df = fn(spark, sfDir)
        val hm = df.queryExecution.analyzed.collect {
          case c: org.apache.spark.sql.catalyst.plans.logical.CollectMetrics => c
        }.nonEmpty
        if (hm) drainedOk &= org.apache.spark.GraftListenerBridge.drain(spark.sparkContext, 10000L)
        Right((df, hm))
      } catch { case e: Throwable => Left(e.toString.takeWhile(_ != '\n').take(200)) }
      val before = new java.util.HashSet(observed.keySet())
      val t0 = System.nanoTime()
      val err = prep match {
        case Left(m) => Some(m)
        case Right((df, _)) =>
          try { df.write.mode("overwrite").format("noop").save(); None }
          catch { case e: Throwable => Some(e.toString.takeWhile(_ != '\n').take(200)) }
      }
      val elapsed = (System.nanoTime() - t0) / 1e9
      val hasMetrics = prep.fold(_ => false, _._2)
      if (hasMetrics)
        drainedOk &= org.apache.spark.GraftListenerBridge.drain(spark.sparkContext, 10000L)
      val newKeys = new java.util.HashSet(observed.keySet())
      newKeys.removeAll(before)
      // a drain timeout means the diff window is no longer exact — say so
      // in the output instead of reporting exact-looking attribution
      val degraded = if (hasMetrics && !drainedOk)
        Seq(jstr("_attribution_degraded") + ":true") else Seq.empty
      val metrics = newKeys.toArray(Array.empty[String]).sorted
        .map(k => jstr(k) + ":" + observed.get(k)) ++ degraded
      (name, elapsed, err, metrics)
    }
    // failed queries are reported with negative elapsed time AND in an errors
    // map, so a crash can never masquerade as a fast success in bench totals
    val qs = results.map { case (k, v, err, _) =>
      jstr(k) + ":" + (if (err.isDefined) -v else v)
    }.mkString("{", ",", "}")
    val errs = results.collect { case (k, _, Some(e), _) =>
      jstr(k) + ":" + jstr(e)
    }.mkString("{", ",", "}")
    val om = results.collect { case (k, _, _, ms) if ms.nonEmpty =>
      jstr(k) + ":" + ms.mkString("{", ",", "}")
    }.mkString("{", ",", "}")
    val total = results.map(_._2).sum
    val nErr = results.count(_._3.isDefined)
    val outPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "bench_out.json")
    // stdout gets the COMPACT line (fits any tail window: totals + errors +
    // a pointer); the file gets the full per-query detail.
    val compact = s"""{"metric":"total","value":$total,"unit":"sec","nQueries":${results.size},"errors":$errs,"nErrors":$nErr,"sf":${jstr(sfDir)},"perQuery":${jstr(outPath)}}"""
    val full = s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"errors":$errs,"observedMetrics":$om,"sf":${jstr(sfDir)}}"""
    // ONE bare line on the process's real stdout: java.io.FileDescriptor.out
    // bypasses sbt's System.out capture (whose "[info] " prefix breaks
    // line-oriented JSON parsing downstream) and IS System.out everywhere
    // else — never a duplicate.
    val fd = new java.io.PrintStream(new java.io.FileOutputStream(java.io.FileDescriptor.out), true, "UTF-8")
    fd.println(compact)
    try java.nio.file.Files.write(java.nio.file.Paths.get(outPath),
      (full + "\n").getBytes("UTF-8"))
    catch { case e: Throwable => System.err.println(s"bench: could not write $outPath: $e") }
    spark.stop()
  }
}
