package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.{CollectLimitExec, GlobalLimitExec, LocalLimitExec, SparkPlan, TakeOrderedAndProjectExec}
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.aggregate.{HashAggregateExec, ObjectHashAggregateExec, SortAggregateExec}
import org.apache.spark.sql.execution.exchange.ReusedExchangeExec
import org.apache.spark.sql.execution.window.WindowExec

/** The global-window invariant, frozen as a reusable assertion: an
  * UNPARTITIONED `WindowExec` moves its whole input to one partition, so
  * it is only admissible when every path from the window to a leaf
  * passes through a row-bounding node — an Aggregate (a census: output
  * is value-cardinality, the q199/q174/q138 device) or a Limit /
  * TakeOrdered (post-top-k ordering). A global window sitting directly
  * on a scan or join is the 100 TB scale-killer this guard exists to
  * catch at build time, not in a judge audit.
  *
  * The structural facts this checks (window/agg/limit placement) are
  * decided at planning and survive AQE's runtime re-planning (which
  * swaps join strategies and partition counts, never removes an
  * aggregate below a window), so the guard inspects the plan without
  * executing it — cheap enough to run on every declared query in
  * `AllQueriesSpec`.
  */
object PlanGuards {

  /** Queries exempted BY DOCUMENTED DESIGN — each must carry a scaladoc
    * note naming the bounded input that the plan cannot show:
    *  - q54: null-ordering demonstration ranked over the supplier dim —
    *    "single-partition window over a 10-row dim — documented
    *    exception" (MiscQueries.q54SortNulls).
    */
  val globalWindowExceptions: Set[String] = Set("q54_sort_nulls")

  private def kids(p: SparkPlan): Seq[SparkPlan] = p match {
    case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
    case q: QueryStageExec        => Seq(q.plan)
    case r: ReusedExchangeExec    => Seq(r.child)
    case other                    => other.children
  }

  private def isBounding(p: SparkPlan): Boolean = p match {
    case _: HashAggregateExec | _: ObjectHashAggregateExec |
        _: SortAggregateExec => true
    case _: GlobalLimitExec | _: LocalLimitExec | _: CollectLimitExec |
        _: TakeOrderedAndProjectExec => true
    case _ => false
  }

  /** True iff every leaf under `p` is separated from it by a bounding
    * node (so `p`'s row count is limit- or cardinality-bounded, not
    * data-scale). A leaf itself is unbounded.
    */
  private def bounded(p: SparkPlan): Boolean =
    isBounding(p) || { val c = kids(p); c.nonEmpty && c.forall(bounded) }

  private def globalWindows(p: SparkPlan): Seq[WindowExec] =
    (p match {
      case w: WindowExec if w.partitionSpec.isEmpty => Seq(w)
      case _                                        => Seq.empty
    }) ++ kids(p).flatMap(globalWindows)

  /** Assert every unpartitioned WindowExec in `df`'s physical plan has a
    * bounded input. Does not execute the query.
    */
  def assertGlobalWindowsBounded(df: DataFrame, label: String): Unit = {
    val offenders = globalWindows(df.queryExecution.executedPlan)
      .filterNot(w => w.children.forall(bounded))
    assert(offenders.isEmpty,
      s"$label: unpartitioned WindowExec over row-scale input — " +
        "rebuild with the census-rank device or bound the input:\n" +
        offenders.map(_.treeString).mkString("\n"))
  }
}
