package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, LongType, StringType}

/** Per-document Gopher repetition coverages in ONE fused pass over the
  * token array — the q193 kernel. For each window width in [[RepCovsExpr
  * .Widths]] ({2,3,4,5,10} word n-grams), computes over the document's
  * n-grams:
  *   - widths ≤ 4: max over grams of count × gram_chars (top-n-gram
  *     char coverage, Rae et al. 2021 Table A1's numerator)
  *   - widths ≥ 5: Σ over grams occurring ≥ 2× of count × gram_chars
  *     (duplicated-n-gram char coverage; every occurrence's span)
  * Returns array<long> of length 5, one coverage per width, in Widths
  * order. gram_chars = Σ token chars + (n−1) separators — what
  * `len(array_to_string(toks[i:i+n-1], ' '))` yields in the DuckDB
  * oracle, so the rolled-up rule counts replay exactly.
  *
  * This exists because the metric is PER-ROW: an explode + two shuffled
  * groupBys materialized ~5·tokens rows per document across the cluster
  * for what is a row-local computation (the first-cut q193 measured 455s
  * at the 100× rehearsal; this kernel's plan has NO exchange before the
  * 20-row rollup). Grams group by a chained XXH64 digest of the window's
  * token hashes — same 64-bit-collision tolerance as the MinHash/q54
  * families, and collisions are only possible WITHIN one document here.
  * Empty tokens (split artifacts) are skipped, matching
  * `TextQueries.tokens`' filter; a document shorter than a width
  * contributes coverage 0 for it (no whole-text fallback — a 1-gram doc
  * has no 2-gram repetition by definition).
  */
case class RepCovsExpr(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "rep_covs"

  override protected def nullSafeEval(a: Any): Any =
    RepCovsExpr.compute(a.asInstanceOf[ArrayData])

  // one static call — the loop nest stays compiled and inside whole-stage
  // codegen (no interpreted HOF lambda per window element)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = org.apache.spark.sql.graft.RepCovsExpr.compute($a);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object RepCovsExpr {
  /** n-gram widths, in output order: top-coverage for 2/3/4, duplicated
    * coverage for 5/10. */
  val Widths: Array[Int] = Array(2, 3, 4, 5, 10)
  private val TopMax = 4

  def compute(arr: ArrayData): ArrayData = {
    // gather non-empty tokens: chained-XXH64 token hash + char length
    val total = arr.numElements()
    val hs = new Array[Long](total)
    val cum = new Array[Int](total + 1) // cumulative char lengths
    var n = 0
    var i = 0
    while (i < total) {
      if (!arr.isNullAt(i)) {
        val t = arr.getUTF8String(i)
        if (t.numBytes() > 0) {
          hs(n) = XXH64.hashUnsafeBytes(t.getBaseObject, t.getBaseOffset,
            t.numBytes(), 42L)
          cum(n + 1) = cum(n) + t.numChars()
          n += 1
        }
      }
      i += 1
    }
    val out = new Array[Long](Widths.length)
    var w = 0
    while (w < Widths.length) {
      val width = Widths(w)
      if (n >= width) {
        // per-gram (count, glen); glen identical for every true occurrence
        val m = new java.util.HashMap[java.lang.Long, Array[Long]]()
        var p = 0
        while (p <= n - width) {
          var h = 42L
          var j = p
          while (j < p + width) { h = XXH64.hashLong(hs(j), h); j += 1 }
          val glen = (cum(p + width) - cum(p) + width - 1).toLong
          val e = m.get(h)
          if (e == null) m.put(h, Array(1L, glen)) else e(0) += 1L
          p += 1
        }
        var cov = 0L
        val it = m.values().iterator()
        if (width <= TopMax) {
          while (it.hasNext) {
            val e = it.next(); val c = e(0) * e(1)
            if (c > cov) cov = c
          }
        } else {
          while (it.hasNext) {
            val e = it.next()
            if (e(0) >= 2L) cov += e(0) * e(1)
          }
        }
        out(w) = cov
      }
      w += 1
    }
    new GenericArrayData(out)
  }

  def column(toks: Column): Column =
    ExpressionUtils.column(RepCovsExpr(ExpressionUtils.expression(toks)))
}
