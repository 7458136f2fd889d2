package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.graft.CosineSimExpr

/** Engine-facing entry points for the native cosine-similarity expression
  * (implementation in org.apache.spark.sql.graft.CosineSimExpr — the
  * Expression SPI is private[sql]).
  */
object CosineSim {
  /** Column-level: cosineSim($"a", $"b"). */
  def cosineSim(a: Column, b: Column): Column = CosineSimExpr.column(a, b)

  /** SQL-level registration: SELECT cosine_sim(a, b) FROM ... */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "cosine_sim", exprs => CosineSimExpr(exprs(0), exprs(1)), "scala_udf")
}
