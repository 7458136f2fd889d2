package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, DoubleType, LongType}

/** All SRP-LSH band signatures in ONE pass over the vector: for plane p,
  * bit (p % rowsPerBand) of band (p / rowsPerBand) is sign(v · plane_p).
  * Returns array<long> of length `bands`.
  *
  * Replaces `bands × rowsPerBand` separate cosine/dot column expressions —
  * one fused codegen loop over a flat plane matrix held as a reference
  * object, instead of 128 array-literal traversals per row.
  *
  * Malformed-row contract (the IntSqDistExpr convention — "must not
  * silently score"): a vector that is not exactly `dim` long, or one with
  * a NULL element, yields NULL — a truncated or padded projection would
  * silently bucket the row into a wrong-geometry signature. The fixture
  * embeddings are all dim-long and null-free, so well-formed data never
  * pays this.
  */
case class SrpSignatureExpr(child: Expression, planesFlat: Array[Double],
    dim: Int, bands: Int, rowsPerBand: Int)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(DoubleType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "srp_signature"

  override protected def nullSafeEval(a: Any): Any = {
    val v = a.asInstanceOf[ArrayData]
    if (v.numElements() != dim) return null
    var i = 0
    while (i < dim) {
      if (v.isNullAt(i)) return null
      i += 1
    }
    val sigs = new Array[Long](bands)
    var p = 0
    while (p < bands * rowsPerBand) {
      val off = p * dim
      var d = 0.0
      var j = 0
      while (j < dim) { d += v.getDouble(j) * planesFlat(off + j); j += 1 }
      if (d > 0) sigs(p / rowsPerBand) |= (1L << (p % rowsPerBand))
      p += 1
    }
    new GenericArrayData(sigs)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val planes = ctx.addReferenceObj("srpPlanes", planesFlat, "double[]")
      val sigs = ctx.freshName("sigs")
      val p = ctx.freshName("p")
      val d = ctx.freshName("d")
      val i = ctx.freshName("i")
      val off = ctx.freshName("off")
      s"""
         |if ($a.numElements() != $dim) {
         |  ${ev.isNull} = true;
         |} else {
         |  for (int $i = 0; $i < $dim; $i++) {
         |    if ($a.isNullAt($i)) { ${ev.isNull} = true; break; }
         |  }
         |}
         |if (!${ev.isNull}) {
         |  long[] $sigs = new long[$bands];
         |  for (int $p = 0; $p < ${bands * rowsPerBand}; $p++) {
         |    final int $off = $p * $dim;
         |    double $d = 0.0;
         |    for (int $i = 0; $i < $dim; $i++) {
         |      $d += $a.getDouble($i) * $planes[$off + $i];
         |    }
         |    if ($d > 0) $sigs[$p / $rowsPerBand] |= (1L << ($p % $rowsPerBand));
         |  }
         |  ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($sigs);
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SrpSignatureExpr {
  def column(v: Column, planesFlat: Array[Double], dim: Int, bands: Int,
      rowsPerBand: Int): Column =
    ExpressionUtils.column(SrpSignatureExpr(
      ExpressionUtils.expression(v), planesFlat, dim, bands, rowsPerBand))
}
