package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, Generator, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, StringType, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Whitespace word n-grams as a native Generator (the UDTF extension
  * point): one output row per shingle window, emitted lazily — neither
  * the token array nor the gram array ever materializes as a column
  * value. Semantics match `Dedup.shinglesFromTokens(tokens(c), n)`
  * exactly, including the edges: n ≤ 1 emits tokens (nothing for an
  * empty text); 0 ≤ |tokens| < n emits ONE whole-text shingle (the empty
  * string for an empty text — concat_ws over an empty array).
  *
  * Generators run outside whole-stage codegen either way (GenerateExec
  * special-cases only explode/stack), so CodegenFallback costs nothing
  * extra here; the win over transform(sequence…, slice, concat_ws) is
  * skipping two interpreted HOF array builds per document.
  */
case class WordNGrams(child: Expression, n: Int, distinct: Boolean = false)
    extends UnaryExpression with Generator with CodegenFallback
    with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def elementSchema: StructType =
    new StructType().add("t", StringType, nullable = false)
  override def prettyName: String = "word_ngrams"

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val v = child.eval(input)
    if (v == null) return Iterator.empty
    val toks = v.asInstanceOf[UTF8String].toString
      .split("[\\t\\n\\f\\r ]+").filter(_.nonEmpty)
    val base: Iterator[String] =
      if (n <= 1) toks.iterator
      else if (toks.length < n) Iterator.single(toks.mkString(" "))
      else (0 to toks.length - n).iterator.map { i =>
        val sb = new java.lang.StringBuilder(toks(i))
        var j = i + 1
        while (j < i + n) { sb.append(' ').append(toks(j)); j += 1 }
        sb.toString
      }
    // distinct = per-ROW dedup in the kernel: with a per-doc id alongside,
    // this makes a downstream relational `.distinct()` over (id, t)
    // redundant — consumers drop that whole exchange (guide §2.4)
    val out =
      if (!distinct) base
      else {
        val seen = new java.util.HashSet[String]()
        base.filter(seen.add)
      }
    out.map(t => InternalRow(UTF8String.fromString(t)))
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object WordNGrams {
  /** Generator column — use inside a select like explode. */
  def column(text: Column, n: Int): Column =
    ExpressionUtils.column(WordNGrams(ExpressionUtils.expression(text), n))

  /** Per-row-distinct variant: emits each shingle once per input row. */
  def distinctColumn(text: Column, n: Int): Column =
    ExpressionUtils.column(
      WordNGrams(ExpressionUtils.expression(text), n, distinct = true))
}
