package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.graft.{CosineSimExpr, MergePercentiles, TopKPerKeyStrategy}

/** SparkSessionExtensions entry point — wire the engine's native functions
  * and operators into any session via config, so SQL users get them
  * cluster-wide:
  *
  *   spark.sql.extensions=graft.GraftExtensions
  *
  * (or programmatically `.withExtensions(new GraftExtensions)`).
  * Registers `cosine_sim(array<double>, array<double>)` and the
  * TopKPerKey planner strategy.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction((
      FunctionIdentifier("cosine_sim"),
      new ExpressionInfo(classOf[CosineSimExpr].getName, "cosine_sim"),
      (exprs: Seq[Expression]) => CosineSimExpr(exprs(0), exprs(1))))
    e.injectPlannerStrategy(_ => TopKPerKeyStrategy)
    e.injectOptimizerRule(_ => MergePercentiles)
  }
}
