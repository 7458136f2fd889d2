package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** N stopword-set `\b(w1|w2|…)\b` match counts in ONE byte scan — the
  * [[TextStatsExpr]] island reformulation generalized to caller-supplied
  * word sets. Returns array<long>, element k = the count RE2 (the DuckDB
  * oracle's engine) produces for `regexp_count(text, '\b(set_k)\b')`.
  *
  * Why this exists (VERDICT r14 next-round #1): the q28 stop set and the
  * q29/q138 language-marker scores were the LAST sites still running
  * java.util.regex `\b`, which is Unicode-aware — 'é' is a Java word
  * char, so Java finds no match in "the·é" cases where RE2's ASCII `\b`
  * does ("ABé" → RE2 matches "AB", Java does not). Every fixture is pure
  * ASCII so the carriers stayed oracle-green, but the divergence was
  * latent; this kernel computes the ORACLE's answer (the same resolution
  * TextStatsExpr applied to the quality-rule family) and collapses the
  * four language-marker regex traversals of q29/q138 into one scan.
  *
  * Match semantics: a match is exactly a maximal word-char island
  * ([A-Za-z0-9_], RE2's ASCII `\w`) byte-equal to one of the set's words
  * (case-sensitive). Bytes ≥ 0x80 are never word chars (RE2 `\b` is
  * ASCII-only), so they close islands; regexp_count's non-overlapping
  * scan and island disjointness coincide. Iterates via
  * UTF8String.getByte — no per-row byte[] copy (ADVICE r14).
  */
case class StopCountsExpr(child: Expression, sets: Seq[Seq[String]])
    extends UnaryExpression with ExpectsInputTypes {

  require(sets.nonEmpty && sets.forall(_.nonEmpty),
    "StopCountsExpr needs at least one non-empty word set")
  require(sets.forall(_.forall(w =>
      w.nonEmpty && w.forall(c =>
        (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z') ||
          (c >= '0' && c <= '9') || c == '_'))),
    "stopwords must be non-empty ASCII word-char strings (the island " +
      "reformulation of \\b(...)\\b only holds for such alternations)")
  require(sets.forall(ws => ws.distinct.length == ws.length),
    "a duplicated word within one set would double-count its islands " +
      "(regex alternation would not)")

  @transient private lazy val matcher =
    new StopSetMatcher(sets.map(_.toArray).toArray)

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "stop_counts"

  override protected def nullSafeEval(a: Any): Any =
    matcher.count(a.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val m = ctx.addReferenceObj("stopSetMatcher", matcher,
      classOf[StopSetMatcher].getName)
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $m.count($a);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Precompiled word-set matcher shared by eval and codegen (registered as
  * a codegen reference object — the word tables compile once per plan,
  * not per row). */
final class StopSetMatcher(sets: Array[Array[String]]) extends Serializable {

  private val nSets = sets.length
  // flat (setIdx, wordBytes) pairs — a handful of words total, so the
  // per-island probe is a few length checks, vs one full regex traversal
  // of the text per set in the form this replaces
  private val flatSet: Array[Int] =
    sets.iterator.zipWithIndex.flatMap { case (ws, k) => ws.map(_ => k) }.toArray
  private val flatWord: Array[Array[Byte]] =
    sets.iterator.flatten.map(_.getBytes("UTF-8")).toArray
  private val maxLen: Int = flatWord.iterator.map(_.length).max

  @inline private def isWord(b: Byte): Boolean =
    (b >= 'a' && b <= 'z') || (b >= 'A' && b <= 'Z') ||
      (b >= '0' && b <= '9') || b == '_'

  def count(s: UTF8String): ArrayData = {
    val n = s.numBytes()
    val counts = new Array[Long](nSets)
    var island = -1 // start of the current word-char island, -1 outside
    var i = 0
    while (i <= n) {
      // virtual trailing non-word byte closes a final island; bytes
      // ≥ 0x80 (UTF-8 lead/continuation) are non-word, closing islands
      // exactly where RE2's ASCII \b puts the boundary
      val b: Byte = if (i < n) s.getByte(i) else ' '
      if (i < n && isWord(b)) {
        if (island < 0) island = i
      } else if (island >= 0) {
        val len = i - island
        if (len <= maxLen) {
          var k = 0
          while (k < flatWord.length) {
            val w = flatWord(k)
            if (w.length == len) {
              var j = 0
              while (j < len && s.getByte(island + j) == w(j)) j += 1
              if (j == len) counts(flatSet(k)) += 1L
            }
            k += 1
          }
        }
        island = -1
      }
      i += 1
    }
    new GenericArrayData(counts)
  }
}

object StopCountsExpr {
  /** `stop_counts(textCol, sets)` as a Column. */
  def column(text: Column, sets: Seq[Seq[String]]): Column =
    ExpressionUtils.column(
      StopCountsExpr(ExpressionUtils.expression(text), sets))

  /** Single-set convenience: returns the bare count as a long Column. */
  def single(text: Column, words: Seq[String]): Column =
    org.apache.spark.sql.functions.element_at(column(text, Seq(words)), 1)
}
