package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, Generator, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.unsafe.types.UTF8String

/** Per-document DISTINCT hashed shingle digests as a native Generator —
  * the digest-early staging of the exact-Jaccard family
  * (`Dedup.distinctHashedShingles`) fused into one byte scan:
  * whitespace-tokenize, xxhash64 each token span IN PLACE, fold each
  * n-token window's hashes, sort + dedup, emit one LongType row per
  * distinct digest.
  *
  * Value parity is bit-exact with the HOF formulation it replaces —
  * `explode(hashedShinglesFromTokens(transform(tokens(c), xxhash64), n))`
  * — because every hash call is the same catalyst XXH64 primitive Spark's
  * own xxhash64 expression evaluates (HashedNGramsSpec pins this
  * property-style):
  *   - token hash = XXH64 over the token's UTF-8 bytes, seed 42 (tokens
  *     are spans of the input — the ASCII whitespace class [\t\n\f\r ]
  *     can never split a multi-byte UTF-8 sequence, so the span bytes are
  *     the token bytes and nothing is copied);
  *   - window digest = the seed-chained fold XXH64.hashLong(h_i, prev)
  *     starting at 42 — exactly how catalyst hashes an array<long>;
  *   - |tokens| < n (including the empty text) folds ALL token hashes:
  *     the one whole-text shingle, = 42 for an empty text (catalyst's
  *     hash of an empty array is the seed);
  *   - n ≤ 1 emits the distinct token hashes themselves.
  *
  * Per-doc dedup makes a downstream `.distinct()` over (doc_id, digest)
  * redundant (rows from different docs differ in doc_id), so consumers
  * drop that exchange outright (guide §2.4). The HOF form additionally
  * built three interpreted array values per document (token strings,
  * token hashes, window digests via per-window `slice` allocations) —
  * HOFs never enter whole-stage codegen; this emits rows in one pass.
  */
case class HashedNGrams(child: Expression, n: Int)
    extends UnaryExpression with Generator with CodegenFallback
    with ExpectsInputTypes {

  import org.apache.spark.sql.types.{AbstractDataType, LongType, StringType, StructType}

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def elementSchema: StructType =
    new StructType().add("t", LongType, nullable = false)
  override def prettyName: String = "hashed_ngrams"

  private val Seed = 42L

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val v = child.eval(input)
    if (v == null) return Iterator.empty
    val s = v.asInstanceOf[UTF8String]
    val base = s.getBaseObject
    val off = s.getBaseOffset
    val len = s.numBytes
    // token-span hashes in one byte scan (ASCII whitespace delimiters)
    var th = new Array[Long](16)
    var nt = 0
    var i = 0
    while (i < len) {
      var b = org.apache.spark.unsafe.Platform.getByte(base, off + i)
      while (i < len && (b == 0x09 || b == 0x0a || b == 0x0c || b == 0x0d ||
          b == 0x20)) {
        i += 1
        if (i < len) b = org.apache.spark.unsafe.Platform.getByte(base, off + i)
      }
      if (i < len) {
        val start = i
        while (i < len && {
          val c = org.apache.spark.unsafe.Platform.getByte(base, off + i)
          c != 0x09 && c != 0x0a && c != 0x0c && c != 0x0d && c != 0x20
        }) i += 1
        if (nt == th.length) th = java.util.Arrays.copyOf(th, nt * 2)
        th(nt) = XXH64.hashUnsafeBytes(base, off + start, i - start, Seed)
        nt += 1
      }
    }
    val out: Array[Long] =
      if (n <= 1) {
        java.util.Arrays.copyOf(th, nt)
      } else if (nt < n) {
        var h = Seed
        var j = 0
        while (j < nt) { h = XXH64.hashLong(th(j), h); j += 1 }
        Array(h)
      } else {
        val w = new Array[Long](nt - n + 1)
        var iW = 0
        while (iW <= nt - n) {
          var h = Seed
          var j = iW
          while (j < iW + n) { h = XXH64.hashLong(th(j), h); j += 1 }
          w(iW) = h
          iW += 1
        }
        w
      }
    java.util.Arrays.sort(out)
    new Iterator[InternalRow] {
      private var k = 0
      override def hasNext: Boolean = k < out.length
      override def next(): InternalRow = {
        val v = out(k)
        k += 1
        while (k < out.length && out(k) == v) k += 1
        InternalRow(v)
      }
    }
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object HashedNGrams {
  /** Generator column — use inside a select like explode. */
  def column(text: Column, n: Int): Column =
    ExpressionUtils.column(HashedNGrams(ExpressionUtils.expression(text), n))
}
