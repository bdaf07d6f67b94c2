package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution._

/** Committed diagnostic main, outside the driver contract: find entries
  * whose final global sort's range exchange feeds directly off expensive
  * compute (join / generate / object map / window) with no materialized
  * exchange in between — the boundary-sampling double-execution shape.
  * Uses [[graft.functions.SortSampleFenceRule.expensiveBelow]], the same
  * predicate the (default-off) session fence rule applies, so an audit hit
  * is exactly a shape the rule would fence — a CANDIDATE for a manual
  * [[graft.ops.SkewOps.sortFence]], to be adopted only when a battery-mode
  * A/B shows the subtree's recompute beats the fence's extra shuffle
  * (round 17 measured most candidates as fence losses; see
  * OPTIMIZATION_r17.md). Prints entry name + the offending node kinds.
  */
object SortAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
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
    // below a range exchange, collect expensive node names reachable
    // WITHOUT crossing another exchange (those are materialized stages) —
    // membership delegated to the rule's shared predicate so audit and
    // rule can never disagree
    def expensiveBelow(p: SparkPlan): Seq[String] = p match {
      case _: exchange.Exchange => Nil
      case _ =>
        val here =
          if (graft.functions.SortSampleFenceRule.expensiveNode(p))
            Seq(p.getClass.getSimpleName)
          else Nil
        here ++ p.children.flatMap(expensiveBelow)
    }
    def rangeExchangeChildren(p: SparkPlan): Seq[SparkPlan] = {
      val here = p match {
        case e: exchange.ShuffleExchangeExec
          if e.outputPartitioning.isInstanceOf[
            org.apache.spark.sql.catalyst.plans.physical.RangePartitioning] =>
          Seq(e.child)
        case _ => Nil
      }
      here ++ p.children.flatMap(rangeExchangeChildren) ++ (p match {
        case a: adaptive.AdaptiveSparkPlanExec => rangeExchangeChildren(a.initialPlan)
        case _ => Nil
      })
    }
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val df = fn(spark, sfDir)
        val bad = rangeExchangeChildren(df.queryExecution.executedPlan)
          .flatMap(expensiveBelow).distinct
        if (bad.nonEmpty) println(f"$name%-32s ${bad.mkString(", ")}")
      } catch { case e: Throwable => println(s"$name PLAN FAILED: ${e.toString.take(100)}") }
    }
    spark.stop()
  }
}
