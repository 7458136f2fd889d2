package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Winnowed document fingerprints in ONE fused pass over the text — the
  * q42/q60 kernel. Bit-identical to the declarative form it replaces
  * (`Dedup.winnowingFingerprints`' staged HOF pipeline, and therefore to
  * the `Xxh64Sql` DuckDB oracle):
  *   - gram i (1-based char position, i ≤ numChars−k+1) hashes as
  *     `xxhash64(substr(text, i, k))` — XXH64 over the gram's UTF-8
  *     bytes, seed 42, located via a precomputed char→byte offset table
  *     so no substring is ever materialized;
  *   - window j's fingerprint is the min gram hash in grams [j, j+w) —
  *     computed with a monotonic deque (O(n) total, vs the HOF form's
  *     slice+array_min O(n·w) with an array copy per window);
  *   - a text with ≥1 gram but fewer than w grams yields ONE fingerprint
  *     (the min of all grams); an empty/short text yields an empty array;
  *   - fingerprints dedup preserving FIRST occurrence, matching
  *     `array_distinct`.
  * Row-local computation, so it belongs in an Expression, not the DAG
  * (the q193 RepCovsExpr rule); the plan stays a map-only projection.
  */
case class WinnowExpr(child: Expression, k: Int, w: Int)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "winnow_fp"

  override protected def nullSafeEval(a: Any): Any =
    WinnowExpr.compute(a.asInstanceOf[UTF8String], k, w)

  // one static call — loop nest stays compiled inside whole-stage codegen
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = org.apache.spark.sql.graft.WinnowExpr.compute($a, $k, $w);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object WinnowExpr {
  def compute(text: UTF8String, k: Int, w: Int): GenericArrayData = {
    val base = text.getBaseObject
    val baseOff = text.getBaseOffset
    val nBytes = text.numBytes()
    // char→byte offset table (UTF-8 continuation bytes are 10xxxxxx);
    // off(c) = byte offset of char c, off(nChars) = nBytes
    var nChars = 0
    var b = 0
    while (b < nBytes) {
      if ((org.apache.spark.unsafe.Platform.getByte(base, baseOff + b) & 0xC0)
          != 0x80) nChars += 1
      b += 1
    }
    val nGrams = nChars - (k - 1)
    if (nGrams < 1) return new GenericArrayData(Array.emptyLongArray)
    val off = new Array[Int](nChars + 1)
    var c = 0
    b = 0
    while (b < nBytes) {
      if ((org.apache.spark.unsafe.Platform.getByte(base, baseOff + b) & 0xC0)
          != 0x80) { off(c) = b; c += 1 }
      b += 1
    }
    off(nChars) = nBytes
    val grams = new Array[Long](nGrams)
    var i = 0
    while (i < nGrams) {
      grams(i) = XXH64.hashUnsafeBytes(base, baseOff + off(i),
        off(i + k) - off(i), 42L)
      i += 1
    }
    val out = new java.util.ArrayList[java.lang.Long]()
    val seen = new java.util.HashSet[java.lang.Long]()
    if (nGrams < w) {
      // fewer grams than a window: one fingerprint, the min of all grams
      var m = grams(0)
      i = 1
      while (i < nGrams) { if (grams(i) < m) m = grams(i); i += 1 }
      out.add(m)
    } else {
      // monotonic deque of gram INDICES, increasing hash values; front is
      // the window min. O(n) total — each index enters and leaves once.
      val dq = new Array[Int](nGrams)
      var head = 0
      var tail = 0 // exclusive
      i = 0
      while (i < nGrams) {
        while (tail > head && grams(dq(tail - 1)) >= grams(i)) tail -= 1
        dq(tail) = i; tail += 1
        if (dq(head) <= i - w) head += 1
        if (i >= w - 1) {
          val m: java.lang.Long = grams(dq(head))
          if (seen.add(m)) out.add(m)
        }
        i += 1
      }
    }
    val arr = new Array[Long](out.size())
    i = 0
    while (i < arr.length) { arr(i) = out.get(i); i += 1 }
    new GenericArrayData(arr)
  }

  def column(text: Column, k: Int, w: Int): Column =
    ExpressionUtils.column(WinnowExpr(ExpressionUtils.expression(text), k, w))
}
