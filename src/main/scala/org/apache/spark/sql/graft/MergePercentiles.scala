package org.apache.spark.sql.graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Percentile}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.DoubleType

/** Optimizer rule: fuse N scalar `percentile(col, p)` aggregates over the
  * same column into ONE array-percentile plus cheap element extracts.
  *
  * `percentile` is a buffering aggregate — each scalar call builds its own
  * per-group value map over the full input, so the natural way to ask for
  * quartiles (four separate calls, what every SQL user writes) pays the
  * buffer 4×. Spark's own optimizer has no rule for this; measured on q75
  * the fusion is 4.1s → 1.7s at sf0.1. Semantics-preserving by
  * construction: `Percentile` evaluates an array percentage with the same
  * interpolation per element, and the rewrite only touches calls whose
  * child/frequency/mode match exactly (no DISTINCT, no FILTER).
  *
  * Registered via GraftExtensions (injectOptimizerRule) or
  * `MergePercentiles.ensure(spark)` (experimental.extraOptimizations —
  * the same self-registration pattern as TopKPerKey). Idempotent: after
  * one pass the percentages are arrays, which the matcher ignores.
  */
object MergePercentiles extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case agg: Aggregate =>
      val candidates = agg.aggregateExpressions.flatMap(_.collect {
        // scalar literal percentage only; DISTINCT / FILTER forms are
        // left untouched (their buffers are not shareable)
        case ae @ AggregateExpression(
            p @ Percentile(_, Literal(pct: Double, DoubleType), _, _, _, _),
            _, false, None, _) => (ae, p, pct)
      })
      val grouped = candidates
        .groupBy { case (ae, p, _) =>
          (p.child.canonicalized, p.frequencyExpression.canonicalized,
            p.reverse, ae.mode)
        }
        .filter { case (_, list) => list.map(_._3).distinct.size >= 2 }
      if (grouped.isEmpty) agg
      else {
        val replacements: Map[ExprId, Expression] = grouped.values.flatMap {
          list =>
            val ps = list.map(_._3).distinct
            val (baseAe, baseP, _) = list.head
            // ONE shared AggregateExpression instance: physical planning
            // dedupes identical instances, so all extracts read the same
            // buffer. FRESH resultId — reusing the base's would make the
            // replacement subtree itself match the rewrite (infinite
            // transformDown).
            val merged = baseAe.copy(
              aggregateFunction = baseP.copy(
                percentageExpression =
                  CreateArray(ps.map(Literal(_, DoubleType)))),
              resultId = NamedExpression.newExprId)
            list.map { case (ae, _, pct) =>
              ae.resultId ->
                (GetArrayItem(merged, Literal(ps.indexOf(pct))): Expression)
            }
        }.toMap
        agg.copy(aggregateExpressions = agg.aggregateExpressions.map(ne =>
          ne.transform {
            case ae: AggregateExpression if replacements.contains(ae.resultId) =>
              replacements(ae.resultId)
          }.asInstanceOf[NamedExpression]))
      }
  }

  /** Idempotently register on a session without the extensions config. */
  def ensure(session: SparkSession): Unit =
    if (!session.experimental.extraOptimizations.contains(MergePercentiles)) {
      session.experimental.extraOptimizations =
        session.experimental.extraOptimizations :+ MergePercentiles
    }
}
