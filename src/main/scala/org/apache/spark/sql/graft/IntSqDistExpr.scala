package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, LongType}

/** EXACT integer squared-L2 distance between two array<long> columns —
  * the scan kernel of the fixed-point-twin brute legs (q186's exact
  * baseline): one fused codegen loop instead of the interpreted
  * `aggregate(zip_with(a, b, (x,y) => (x−y)²), 0L, _+_)` fold it
  * replaces (~10× per row on corpus-wide audit scans, same bit-exact
  * BIGINT sum). Mirrors the HOF form's null contract on BOTH malformed
  * shapes: zip_with pads the shorter array with NULL, and a NULL element
  * makes its (x−y)² NULL — either way the `_+_` fold nulls the whole
  * sum. So unequal lengths AND any NULL element return NULL here too
  * (the twins' vectors are all Dim long and null-free; the contract only
  * matters for malformed rows, which must not silently score).
  */
case class IntSqDistExpr(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(LongType), ArrayType(LongType))
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "int_sqdist"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var d = 0L
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      val t = x.getLong(i) - y.getLong(i)
      d += t * t
      i += 1
    }
    java.lang.Long.valueOf(d)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val d = ctx.freshName("d")
      val t = ctx.freshName("t")
      s"""
         |final int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  long $d = 0L;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    final long $t = $a.getLong($i) - $b.getLong($i);
         |    $d += $t * $t;
         |  }
         |  if (!${ev.isNull}) { ${ev.value} = $d; }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object IntSqDistExpr {
  def column(a: Column, b: Column): Column =
    ExpressionUtils.column(
      IntSqDistExpr(ExpressionUtils.expression(a), ExpressionUtils.expression(b)))
}
