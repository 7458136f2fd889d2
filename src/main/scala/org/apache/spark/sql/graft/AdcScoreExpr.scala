package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, DoubleType, IntegerType}

/** PQ asymmetric-distance (ADC) score: Σ_mi lut[qidx·m·k + mi·k +
  * codes(mi)] — M flat-array lookups per (vector, query), no vector
  * math.
  *
  * The LUT matrix rides as a REFERENCE OBJECT (ctx.addReferenceObj, the
  * PqEncodeExpr discipline), NOT as a typedlit array literal: a literal
  * is rendered into every SparkListenerSQLExecutionStart plan
  * description and traversed by every Catalyst pass — measured 3× the
  * whole q158 wall at sf0.1 (5.9 → 17.8s) when the 20k-double LUT was a
  * plan literal, with task time unchanged; and not as a join-side
  * column either — materializing a joined row copies the 8 KB LUT field
  * into every output row (16 GB of memcpy on the 50× scored relation).
  *
  * left = codes (array<int> from PqEncodeExpr), right = qidx (int index
  * into the query batch, 0-based).
  */
case class AdcScoreExpr(left: Expression, right: Expression,
    lutsFlat: Array[Double], m: Int, k: Int)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(IntegerType), IntegerType)
  override def dataType: DataType = DoubleType
  override def prettyName: String = "adc_score"

  override protected def nullSafeEval(codesAny: Any, qidxAny: Any): Any = {
    val codes = codesAny.asInstanceOf[ArrayData]
    val base = qidxAny.asInstanceOf[Int] * m * k
    var s = 0.0
    var mi = 0
    while (mi < m) {
      s += lutsFlat(base + mi * k + codes.getInt(mi))
      mi += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (codes, qidx) => {
      val luts = ctx.addReferenceObj("adcLuts", lutsFlat, "double[]")
      val base = ctx.freshName("base")
      val s = ctx.freshName("s")
      val mi = ctx.freshName("mi")
      s"""
         |final int $base = $qidx * ${m * k};
         |double $s = 0.0;
         |for (int $mi = 0; $mi < $m; $mi++) {
         |  $s += $luts[$base + $mi * $k + $codes.getInt($mi)];
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): Expression = copy(left = newLeft, right = newRight)
}

object AdcScoreExpr {
  def column(codes: Column, qidx: Column, lutsFlat: Array[Double],
      m: Int, k: Int): Column = {
    require(lutsFlat.length % (m * k) == 0,
      s"flat LUT length ${lutsFlat.length} not a multiple of m*k=${m * k}")
    ExpressionUtils.column(AdcScoreExpr(
      ExpressionUtils.expression(codes), ExpressionUtils.expression(qidx),
      lutsFlat, m, k))
  }
}
