package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, LongType, StringType}

/** Hashed-bag-of-words bucket counts in ONE fused pass over the token
  * array — the Distill inference kernel. For each non-empty token,
  * bucket = pmod(xxhash64(token), buckets) (production hash, seed 42 —
  * bit-identical to `pmod(xxhash64(t), lit(buckets))` on the exploded
  * stream, which is what the DuckDB oracle replays); returns the
  * `buckets`-long array<long> of counts.
  *
  * This exists for the same reason as [[RepCovsExpr]] (the q193 lesson):
  * the per-document margin is a ROW-LOCAL computation, but the first-cut
  * explode → groupBy(doc,bucket) → groupBy(doc) form shuffled ~tokens
  * rows per document twice across the cluster — measured 55s/query at
  * the 100× rehearsal for what this kernel does in a map-side pass
  * (q195–q198 each paid it independently). With counts per row, the
  * margin is a literal-weight expression and the whole inference plan is
  * scan → kernel → rollup, no exchange before the final aggregate.
  *
  * Empty tokens (split artifacts) are skipped, matching
  * `TextQueries.tokens`' filter; a NULL element is skipped too
  * ([[RepCovsExpr]]'s convention). NOTE this is NOT what the exploded
  * form does with a NULL token — explode emits the row and
  * `pmod(xxhash64(NULL), b)` buckets the SEED's hash — so the
  * bit-equivalence contract holds only for null-free arrays. Every
  * production caller feeds `TextQueries.tokens` output, whose filter
  * admits no nulls; BucketCountsSpec pins the skip behavior.
  */
case class BucketCountsExpr(child: Expression, buckets: Int)
    extends UnaryExpression with ExpectsInputTypes {

  require(buckets > 0, s"buckets must be positive, got $buckets")

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "bucket_counts"

  override protected def nullSafeEval(a: Any): Any =
    BucketCountsExpr.compute(a.asInstanceOf[ArrayData], buckets)

  // one static call — the token loop stays compiled and inside
  // whole-stage codegen (no interpreted HOF lambda per element)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = org.apache.spark.sql.graft.BucketCountsExpr.compute($a, $buckets);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object BucketCountsExpr {
  def compute(arr: ArrayData, buckets: Int): ArrayData = {
    val counts = new Array[Long](buckets)
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val t = arr.getUTF8String(i)
        if (t.numBytes() > 0) {
          val h = XXH64.hashUnsafeBytes(t.getBaseObject, t.getBaseOffset,
            t.numBytes(), 42L)
          counts((((h % buckets) + buckets) % buckets).toInt) += 1L
        }
      }
      i += 1
    }
    new GenericArrayData(counts)
  }

  /** `bucket_counts(tokensCol, buckets)` as a Column. */
  def column(tokens: Column, buckets: Int): Column =
    ExpressionUtils.column(
      BucketCountsExpr(ExpressionUtils.expression(tokens), buckets))
}
