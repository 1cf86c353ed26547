package graft

import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.window.WindowExec

/** Plan-shape helpers for specs: `AdaptiveSparkPlanExec` is a leaf to
  * TreeNode traversal (children = Nil), so a plain `plan.collect` on an
  * adaptive plan inspects exactly one node and vacuously passes any shape
  * assertion. These descend through the AQE wrapper and query stages.
  * (toString-based checks are unaffected — rendering descends.)
  */
object PlanTestUtil {

  def allNodes(p: SparkPlan): Seq[SparkPlan] = {
    val kids = p match {
      case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
      case q: QueryStageExec => Seq(q.plan)
      case other => other.children
    }
    p +: kids.flatMap(allNodes)
  }

  def windowsIn(p: SparkPlan): Seq[WindowExec] =
    allNodes(p).collect { case w: WindowExec => w }
}
