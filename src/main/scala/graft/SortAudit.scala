package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution._

/** TEMPORARY r16 audit (not part of the driver contract): find entries
  * whose final global sort's range exchange feeds directly off expensive
  * compute (join / generate / object map / window) with no materialized
  * exchange in between — the boundary-sampling double-execution shape
  * fixed in batch 1. Prints entry name + the offending node kinds.
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
    // WITHOUT crossing another exchange (those are materialized stages)
    def expensiveBelow(p: SparkPlan): Seq[String] = p match {
      case _: exchange.Exchange => Nil
      case _ =>
        val here = p.getClass.getSimpleName match {
          case n if n.contains("Join") || n.contains("Generate") ||
            n.contains("MapPartitions") || n.contains("MapElements") ||
            n.contains("Window") || n.contains("Expand") ||
            n.contains("Aggregate") => Seq(n)
          case _ => Nil
        }
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
