package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, DoubleType, IntegerType}

/** Product-quantization encode in ONE pass over the RAW vector: unit-
  * normalize (a zero vector passes through — it has no direction), then
  * for each of `m` subspaces emit the index of the nearest (squared-L2)
  * of `k` codebook centroids. Returns array<int> of length `m`. Ties
  * resolve to the lowest centroid index (matching
  * `array_position(dists, array_min)`).
  *
  * Replaces m×k separate `aggregate(zip_with(slice…))` column expressions
  * plus a twice-evaluated HOF norm — one fused codegen loop over a flat
  * codebook matrix held as a reference object, instead of 128 interpreted
  * lambda folds per row. Elements past the end of a short vector are
  * treated as 0.0.
  */
case class PqEncodeExpr(child: Expression, booksFlat: Array[Double],
    m: Int, k: Int, sub: Int)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(DoubleType))
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "pq_encode"

  override protected def nullSafeEval(a: Any): Any = {
    val v = a.asInstanceOf[ArrayData]
    val lim = v.numElements()
    var nsq = 0.0
    var j = 0
    while (j < lim) { val x = v.getDouble(j); nsq += x * x; j += 1 }
    val scale = if (nsq == 0.0) 1.0 else 1.0 / math.sqrt(nsq)
    val codes = new Array[Int](m)
    var mi = 0
    while (mi < m) {
      var best = 0
      var bd = Double.MaxValue
      var c = 0
      while (c < k) {
        val off = (mi * k + c) * sub
        var d = 0.0
        var i = 0
        while (i < sub) {
          val idx = mi * sub + i
          val x = if (idx < lim) v.getDouble(idx) * scale else 0.0
          val t = x - booksFlat(off + i)
          d += t * t
          i += 1
        }
        if (d < bd) { bd = d; best = c }
        c += 1
      }
      codes(mi) = best
      mi += 1
    }
    new GenericArrayData(codes)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val books = ctx.addReferenceObj("pqBooks", booksFlat, "double[]")
      val codes = ctx.freshName("codes")
      val lim = ctx.freshName("lim")
      val mi = ctx.freshName("mi")
      val c = ctx.freshName("c")
      val best = ctx.freshName("best")
      val bd = ctx.freshName("bd")
      val off = ctx.freshName("off")
      val d = ctx.freshName("d")
      val i = ctx.freshName("i")
      val idx = ctx.freshName("idx")
      val x = ctx.freshName("x")
      val t = ctx.freshName("t")
      val nsq = ctx.freshName("nsq")
      val j = ctx.freshName("j")
      val xj = ctx.freshName("xj")
      val scale = ctx.freshName("scale")
      s"""
         |int[] $codes = new int[$m];
         |final int $lim = $a.numElements();
         |double $nsq = 0.0;
         |for (int $j = 0; $j < $lim; $j++) {
         |  final double $xj = $a.getDouble($j);
         |  $nsq += $xj * $xj;
         |}
         |final double $scale = $nsq == 0.0 ? 1.0 : 1.0 / java.lang.Math.sqrt($nsq);
         |for (int $mi = 0; $mi < $m; $mi++) {
         |  int $best = 0;
         |  double $bd = Double.MAX_VALUE;
         |  for (int $c = 0; $c < $k; $c++) {
         |    final int $off = ($mi * $k + $c) * $sub;
         |    double $d = 0.0;
         |    for (int $i = 0; $i < $sub; $i++) {
         |      final int $idx = $mi * $sub + $i;
         |      final double $x = $idx < $lim ? $a.getDouble($idx) * $scale : 0.0;
         |      final double $t = $x - $books[$off + $i];
         |      $d += $t * $t;
         |    }
         |    if ($d < $bd) { $bd = $d; $best = $c; }
         |  }
         |  $codes[$mi] = $best;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($codes);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object PqEncodeExpr {
  def column(v: Column, codebooks: Array[Array[Array[Double]]]): Column = {
    val m = codebooks.length
    val k = codebooks(0).length
    val sub = codebooks(0)(0).length
    ExpressionUtils.column(PqEncodeExpr(
      ExpressionUtils.expression(v), codebooks.flatMap(_.flatten), m, k, sub))
  }
}
