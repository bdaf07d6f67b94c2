package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.plans.physical.{RangePartitioning, RoundRobinPartitioning}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.QueryStageExec
import org.apache.spark.sql.execution.exchange.{Exchange, REPARTITION_BY_NUM, ShuffleExchangeExec}

/** Materialize-before-sample fence, as a whole-session physical rule.
  *
  * A global sort plans as a range exchange, and a range exchange computes
  * its partition bounds by SAMPLING its child RDD — one full execution of
  * the child subtree — before the output pass executes the child AGAIN.
  * When the subtree under the sort is expensive (a pair-scoring join, a
  * decode kernel, a window), the entry pays for it twice; r16 profiling
  * measured exactly 2× duplicated jobs on the j9/m_* entries at sf0.1,
  * and at 100 TB the duplicated pass is a full extra scan+compute of
  * whatever feeds the final ORDER BY.
  *
  * Under AQE every exchange is a materialized query stage, so inserting a
  * round-robin exchange under the range exchange makes the sampling AND
  * the output pass both read materialized rows (the guide's "materialize
  * an intermediate to truncate the plan"), at the cost of one extra
  * shuffle of the rows being sorted — the rows are about to cross the
  * range exchange anyway, so the added volume equals the sort input, paid
  * once, instead of a second execution of the whole subtree.
  *
  * The fence is inserted ONLY when the subtree between the range exchange
  * and the nearest materialization boundary (any exchange / query stage)
  * contains a join, generator, object map, window or expand — a sort fed
  * directly by a scan or by an exchange output samples cheaply and is
  * left alone. Results are bit-identical: the logical plan (and every
  * oracle) is untouched; only the physical exchange layout changes.
  *
  * DEFAULT OFF since round 17. The round-17 battery-mode A/B
  * (`spark.graft.sortSampleFence` on vs off, fresh JVMs, sf0.1) measured
  * the blanket rule as a consistent 10-20% LOSS on every rule-only
  * beneficiary with a cheap subtree (d16 8.5→7.5 s, d8 6.4→5.6,
  * t_dsir_select 5.5→4.4, stream_substring_dedup 6.2→5.3, d20 7.2→6.6,
  * d24 5.6→5.4): their recompute-under-sampling costs less than the full
  * extra shuffle the fence inserts. The subtrees where the fence wins big
  * (j9's quadratic pair scoring, the m_* decode kernels — the only
  * profiled 2x+ double-execution shapes) carry an EXPLICIT
  * [[graft.ops.SkewOps.sortFence]] at the call site, which also survives
  * sessions that never load the extensions. One mechanism: manual fences
  * where measured; this rule stays available as the measurement lever
  * (`spark.graft.sortSampleFence=true`).
  *
  * Applied via [[GraftExtensions]] (`injectQueryStagePrepRule`).
  */
case class SortSampleFenceRule(session: SparkSession) extends Rule[SparkPlan] {

  import SortSampleFenceRule.expensiveBelow

  override def apply(plan: SparkPlan): SparkPlan = {
    val enabled = session.conf.get("spark.graft.sortSampleFence", "false") == "true"
    if (!enabled) plan
    else plan.transformUp {
      case e @ ShuffleExchangeExec(r: RangePartitioning, child, _, _)
          if !child.isInstanceOf[Exchange] && !child.isInstanceOf[QueryStageExec] &&
            expensiveBelow(child) =>
        val n = math.max(1, session.sessionState.conf.numShufflePartitions)
        e.withNewChildren(Seq(
          ShuffleExchangeExec(RoundRobinPartitioning(n), child, REPARTITION_BY_NUM)))
    }
  }
}

object SortSampleFenceRule {
  /** The ONE expensive-node predicate, shared with [[graft.SortAudit]] so
    * the audit reports exactly the shapes the rule would fence (round-16
    * ADVICE: the audit's private copy additionally matched `Aggregate`,
    * over-reporting entries the rule never acts on — a final aggregate's
    * recompute-under-sampling reads the already-materialized shuffle, which
    * the round-17 A/B showed is cheaper than fencing).
    */
  /** Node-level membership: is `p` ITSELF an expensive-to-recompute node? */
  def expensiveNode(p: SparkPlan): Boolean = {
    val n = p.getClass.getSimpleName
    n.contains("Join") || n.contains("Generate") ||
      n.contains("MapPartitions") || n.contains("MapElements") ||
      n.contains("Window") || n.contains("Expand")
  }

  def expensiveBelow(p: SparkPlan): Boolean = p match {
    case _: Exchange => false
    case _: QueryStageExec => false
    case _ => expensiveNode(p) || p.children.exists(expensiveBelow)
  }
}
