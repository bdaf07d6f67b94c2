package graft
import org.apache.spark.sql.SparkSession

/** Plan-audit aid: print `.explain("formatted")` for registry queries.
  * Usage: runMain graft.PlanDump <sfDir> <queryName...>
  *        runMain graft.PlanDump <sfDir> --audit-windows
  *
  * `--audit-windows` walks EVERY registry query's optimized plan and lists
  * the ones containing an unpartitioned Window (the `WindowExec: No
  * Partition Defined` shape). The known offenders are all summary-sized and
  * carry a [[graft.ops.Bounded.guard]] runtime assertion; this audit — not
  * the log warning, which Bench silences — is what keeps a FUTURE
  * accidental corpus-sized global window visible: a query outside the
  * allowlist fails the audit (exit 1).
  */
object PlanDump {

  /** Registry queries whose unpartitioned windows are audited-benign:
    * every entry here is runtime-guarded via Bounded.guard or bounded by
    * math (see the call sites). Grow this list ONLY with a matching guard.
    */
  val AuditedUnpartitionedWindows: Set[String] = Set(
    "t_dsir_select",       // global top-k, Bounded.guard (Sampling.scala:364)
    "x1_hybrid_rrf",       // fused k-list rank, Bounded.guard (Retrieval.scala:48) + rankTopK
    "x1_search_rank",      // rankTopK: limit(k) BEFORE the rank window (≤ k rows)
    "x1_bm25_rank",        // rankTopK (same ≤ k-row window)
    "t_bigram_lm",         // bucket-summary window, Bounded.guard (TextStats.scala:558)
    "s15_key_skew_report", // count histogram: O(√rows) by math (SkewOps.keySkewReport)
    "ts_path_ngrams",      // global rank AFTER per-bucket top-20 (≤ 64·20 rows)
    "u6_skyline",          // bucket-summary cum-max: ≤ buckets rows, Bounded.guard (Pareto.scala)
    "s21_compaction_plan", // bucket-summary cum-sum: ≤ buckets rows, Bounded.guard (PrefixOps.scala)
    "d21_threshold_sweep") // agreement histogram: ≤ 13 rows, Bounded.guard (PipelineQueries)

  private def unpartitionedWindows(df: org.apache.spark.sql.DataFrame): Int =
    df.queryExecution.optimizedPlan.collect {
      case w: org.apache.spark.sql.catalyst.plans.logical.Window
        if w.partitionSpec.isEmpty => w
    }.size

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.GraftExtensions.register(spark)
    if (args.drop(1).headOption.contains("--audit-windows")) {
      val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
        val n = try unpartitionedWindows(fn(spark, sfDir))
                catch { case e: Throwable => println(s"$name: PLAN FAILED: $e"); 0 }
        if (n > 0) Some(name -> n) else None
      }
      offenders.foreach { case (name, n) =>
        val ok = AuditedUnpartitionedWindows.contains(name)
        println(f"$name%-28s $n unpartitioned window(s)  ${if (ok) "audited-benign" else "NEW OFFENDER"}")
      }
      val fresh = offenders.map(_._1).filterNot(AuditedUnpartitionedWindows.contains)
      if (fresh.nonEmpty) {
        println(s"AUDIT FAILED: unaudited unpartitioned windows in: ${fresh.mkString(", ")}")
        spark.stop(); sys.exit(1)
      }
      println(s"window audit clean: ${offenders.size} audited-benign, 0 new")
    } else {
      args.drop(1).foreach { name =>
        println(s"===== $name =====")
        SparkEntry.queries(name)(spark, sfDir).explain("formatted")
      }
    }
    spark.stop()
  }
}
