package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute, AttributeReference, SparkPartitionID}
import org.apache.spark.sql.catalyst.optimizer.{BuildLeft, BuildRight}
import org.apache.spark.sql.catalyst.plans.physical.HashPartitioning
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.{FilterExec, ProjectExec, SortExec, SparkPlan}
import org.apache.spark.sql.execution.aggregate.BaseAggregateExec
import org.apache.spark.sql.execution.exchange.{ENSURE_REQUIREMENTS, ShuffleExchangeExec}
import org.apache.spark.sql.execution.joins.BroadcastHashJoinExec
import org.apache.spark.sql.execution.window.WindowExec

/** Removes `Exchange hashpartitioning(pid)` when `pid` is
  * `spark_partition_id()` materialized in the same stage.
  *
  * Every row of a partition shares its `spark_partition_id()` value by
  * construction, so ANY physical partitioning already satisfies
  * `ClusteredDistribution(pid)` — but Catalyst only sees an opaque int
  * column and EnsureRequirements inserts a full-data shuffle in front of
  * each `Window.partitionBy(pid)` / `groupBy(pid)`. That doubled the
  * shuffle volume of every [[graft.ops.ScalableWindow]] op (the two-phase
  * global-scan pattern shuffles once to range-partition, then Catalyst
  * re-shuffled the identical layout by pid).
  *
  * Soundness: the elimination applies only when BOTH
  *
  *   1. every partition expression is an attribute that traces — through
  *      partition-preserving operators only (project / filter / local sort /
  *      window / aggregate / the streamed side of a broadcast join) — to an
  *      `Alias(SparkPartitionID())` with no intervening exchange or stage
  *      boundary (any node outside that whitelist — exchanges, shuffle-stage
  *      reads, unions, coalesce — stops the trace and keeps the shuffle);
  *   2. the exchange's CONSUMER is a unary operator whose requirement is a
  *      plain `ClusteredDistribution` — a Window or an Aggregate (optionally
  *      through the local Sort that EnsureRequirements puts above the
  *      exchange). "pid is constant per partition" satisfies clustering for
  *      ONE child in isolation, but a binary consumer (sort-merge join,
  *      set op) additionally needs BOTH children on the SAME partitioning
  *      function; removing only one side silently mis-aligns the join and
  *      drops rows. Those exchanges are always kept.
  *
  * Registered as an AQE query-stage-prep rule ([[GraftExtensions]]), so it
  * runs after EnsureRequirements on every (re-)planning pass.
  */
case class PidShuffleElimination() extends Rule[SparkPlan] {

  /** Does `attr` name a spark_partition_id() computed in this stage? */
  private def tracesToPid(attr: Attribute, plan: SparkPlan): Boolean = plan match {
    case p: ProjectExec =>
      p.projectList.find(_.exprId == attr.exprId) match {
        case Some(Alias(_: SparkPartitionID, _)) => true
        case Some(Alias(a: AttributeReference, _)) => tracesToPid(a, p.child)
        case Some(a: AttributeReference) => tracesToPid(a, p.child)
        case _ => false
      }
    case f: FilterExec => tracesToPid(attr, f.child)
    case s: SortExec if !s.global => tracesToPid(attr, s.child)
    case w: WindowExec if w.child.outputSet.contains(attr) =>
      tracesToPid(attr, w.child)
    case a: BaseAggregateExec if a.child.outputSet.contains(attr) =>
      tracesToPid(attr, a.child)
    case j: BroadcastHashJoinExec =>
      // only the streamed side keeps rows in place; build rows replicate
      val streamed = j.buildSide match {
        case BuildRight => j.left
        case BuildLeft  => j.right
      }
      streamed.outputSet.contains(attr) && tracesToPid(attr, streamed)
    case _ => false
  }

  /** Strip a pid-keyed ENSURE_REQUIREMENTS exchange sitting directly under
    * an eligible unary consumer, looking through the local Sort that
    * EnsureRequirements inserts above the exchange for sort-based consumers.
    * Anything else (including joins' children) is left untouched. */
  private def strip(plan: SparkPlan): SparkPlan = plan match {
    case s: SortExec if !s.global =>
      val c = strip(s.child)
      if (c eq s.child) s else s.copy(child = c)
    case ex: ShuffleExchangeExec if ex.shuffleOrigin == ENSURE_REQUIREMENTS =>
      ex.outputPartitioning match {
        case HashPartitioning(exprs, _) if exprs.nonEmpty && exprs.forall {
              case a: AttributeReference => tracesToPid(a, ex.child)
              case _ => false
            } =>
          ex.child
        case _ => ex
      }
    case other => other
  }

  override def apply(plan: SparkPlan): SparkPlan = plan.transformUp {
    case w: WindowExec =>
      val c = strip(w.child)
      if (c eq w.child) w else w.withNewChildren(Seq(c))
    case a: BaseAggregateExec =>
      val c = strip(a.child)
      if (c eq a.child) a else a.withNewChildren(Seq(c))
  }
}
