package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, IntegerType, LongType}

/** EXACT-INTEGER product-quantization encode — the fixed-point-twin
  * (q183/q184) sibling of [[PqEncodeExpr]]: no normalization, no doubles.
  * For each of `m` subspaces of width `sub` over an `array<long>` vector,
  * emit the index of the nearest (integer squared-L2) of `k` codebook
  * centroids; ties resolve to the lowest index (`d < bd` keeps the first
  * minimum — the twins' lowest-cid rule). Every distance is a BIGINT sum
  * of (x−c)² terms, so the result is bit-identical to the interpreted
  * `array_sort(array(struct(aggregate(zip_with(…)))))` form it replaces —
  * but as ONE fused codegen loop over a flat long[] reference object
  * instead of m×k interpreted lambda folds per row (the 50× rehearsal
  * measured the HOF form at ~40s/250k vectors per twin; the whole
  * assignment now stays inside WholeStageCodegen). Elements past the end
  * of a short vector are treated as 0.
  */
case class IntCodesExpr(child: Expression, booksFlat: IndexedSeq[Long],
    m: Int, k: Int, sub: Int)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(LongType))
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "int_codes"

  // IndexedSeq in the case-class field keeps equals/hashCode VALUE-based
  // (an Array field compares by reference, defeating canonicalization and
  // common-subexpression elimination); eval/codegen still run over a flat
  // long[] — materialized once here, not per row.
  @transient private lazy val booksArr: Array[Long] = booksFlat.toArray

  override protected def nullSafeEval(a: Any): Any = {
    val v = a.asInstanceOf[ArrayData]
    val lim = v.numElements()
    val codes = new Array[Int](m)
    var mi = 0
    while (mi < m) {
      var best = 0
      var bd = Long.MaxValue
      var c = 0
      while (c < k) {
        val off = (mi * k + c) * sub
        var d = 0L
        var i = 0
        while (i < sub) {
          val idx = mi * sub + i
          val x = if (idx < lim) v.getLong(idx) else 0L
          val t = x - booksArr(off + i)
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
      val books = ctx.addReferenceObj("intBooks", booksArr, "long[]")
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
      s"""
         |int[] $codes = new int[$m];
         |final int $lim = $a.numElements();
         |for (int $mi = 0; $mi < $m; $mi++) {
         |  int $best = 0;
         |  long $bd = Long.MAX_VALUE;
         |  for (int $c = 0; $c < $k; $c++) {
         |    final int $off = ($mi * $k + $c) * $sub;
         |    long $d = 0L;
         |    for (int $i = 0; $i < $sub; $i++) {
         |      final int $idx = $mi * $sub + $i;
         |      final long $x = $idx < $lim ? $a.getLong($idx) : 0L;
         |      final long $t = $x - $books[$off + $i];
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

object IntCodesExpr {
  /** Codes column over integer codebooks [m][k][sub]. */
  def column(v: Column, codebooks: IndexedSeq[IndexedSeq[IndexedSeq[Long]]]): Column = {
    val m = codebooks.length
    val k = codebooks(0).length
    val sub = codebooks(0)(0).length
    ExpressionUtils.column(IntCodesExpr(ExpressionUtils.expression(v),
      codebooks.flatten.flatten, m, k, sub))
  }

  /** Single-codebook argmin cid (the IVF assignment form). */
  def argmin(v: Column, cents: IndexedSeq[IndexedSeq[Long]]): Column =
    org.apache.spark.sql.functions.element_at(
      column(v, IndexedSeq(cents)), 1)
}
