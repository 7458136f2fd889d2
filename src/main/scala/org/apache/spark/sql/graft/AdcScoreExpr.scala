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
  *
  * Malformed-row contract (the IntSqDistExpr convention — "must not
  * silently score"): a codes array that is not exactly m long, a NULL
  * code element, a code outside [0, k), or a qidx whose LUT block is
  * outside the flat matrix all yield NULL — never a garbage LUT slot or
  * an ArrayIndexOutOfBounds mid-stage. The production encoders emit
  * exactly-m in-range codes, so on well-formed data this is free.
  */
case class AdcScoreExpr(left: Expression, right: Expression,
    lutsFlat: Array[Double], m: Int, k: Int)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(IntegerType), IntegerType)
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "adc_score"

  override protected def nullSafeEval(codesAny: Any, qidxAny: Any): Any = {
    val codes = codesAny.asInstanceOf[ArrayData]
    val qidx = qidxAny.asInstanceOf[Int]
    // long arithmetic: a huge qidx would overflow int in qidx·m·k and
    // could slip past the bound check with a wrapped-negative base
    if (codes.numElements() != m || qidx < 0 ||
      (qidx.toLong + 1L) * (m * k) > lutsFlat.length) return null
    val base = qidx * m * k
    var s = 0.0
    var mi = 0
    while (mi < m) {
      if (codes.isNullAt(mi)) return null
      val c = codes.getInt(mi)
      if (c < 0 || c >= k) return null
      s += lutsFlat(base + mi * k + c)
      mi += 1
    }
    java.lang.Double.valueOf(s)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (codes, qidx) => {
      val luts = ctx.addReferenceObj("adcLuts", lutsFlat, "double[]")
      val base = ctx.freshName("base")
      val s = ctx.freshName("s")
      val mi = ctx.freshName("mi")
      val c = ctx.freshName("c")
      s"""
         |if ($codes.numElements() != $m || $qidx < 0 ||
         |    ((long) $qidx + 1L) * ${m * k} > ${lutsFlat.length}L) {
         |  ${ev.isNull} = true;
         |} else {
         |  final int $base = $qidx * ${m * k};
         |  double $s = 0.0;
         |  for (int $mi = 0; $mi < $m; $mi++) {
         |    if ($codes.isNullAt($mi)) { ${ev.isNull} = true; break; }
         |    final int $c = $codes.getInt($mi);
         |    if ($c < 0 || $c >= $k) { ${ev.isNull} = true; break; }
         |    $s += $luts[$base + $mi * $k + $c];
         |  }
         |  if (!${ev.isNull}) { ${ev.value} = $s; }
         |}
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
