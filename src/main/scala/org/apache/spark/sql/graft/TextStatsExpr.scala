package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** The six Gopher-rule text metrics in ONE byte scan — replaces six
  * separate regexp_count passes (each a full java.util.regex traversal of
  * the text; measured as the 26.9s floor of q149 at the 100× rehearsal
  * and the dominant cost of every quality-rule carrier). Returns
  * array<long>:
  *
  *   [0] n_words    — maximal runs of non-separator chars, separator =
  *                    the explicit class {\t \n \f \r ' '} (regexp_count
  *                    `[^\t\n\f\r ]+` — NOT \s, the repo-wide convention)
  *   [1] n_nonspace — count of non-separator CHARACTERS (code points,
  *                    not bytes: a continuation byte never starts one)
  *   [2] n_sym      — chars in {# @ % ^ * _ ~ |}
  *   [3] n_digit    — chars in [0-9]
  *   [4] n_caps     — `\b[A-Z]{2,}\b` matches. With Java's default ASCII
  *                    \b (word chars = [A-Za-z0-9_]), a match is exactly
  *                    a maximal word-char island that is all-[A-Z] with
  *                    length ≥ 2 (any trailing/leading word char kills
  *                    the boundary and backtracking cannot save it)
  *   [5] n_stop     — `\b(the|a|of|and|to|in)\b` matches = maximal
  *                    word-char islands equal to one of the six
  *                    stopwords (case-sensitive)
  *   [6] n_punct    — chars in {. , ! ? ; :} (the qualityLogit class)
  *   [7] n_subtok   — `[A-Za-z0-9]{1,4}|[^A-Za-z0-9\t\n\f\r ]` matches
  *                    (TextQueries.SubtokenPattern, the BPE-ish piece
  *                    count). The greedy left-to-right scan makes this
  *                    ceil(L/4) per maximal [A-Za-z0-9] island (NO
  *                    underscore — unlike the \b islands) plus one per
  *                    non-alnum non-separator CODE POINT (Java's negated
  *                    class and RE2's both consume one code point, so
  *                    counting lead bytes matches both engines)
  *
  * Byte-level correctness: all classified chars are ASCII, and UTF-8
  * multi-byte sequences have the high bit set on every byte — so a byte
  * ≥ 0x80 is never a separator, class member, or word char, and word/run
  * boundaries computed on bytes equal those computed on code points.
  *
  * \b semantics: the island reformulation implements the ASCII word
  * boundary — which is what DuckDB's RE2 executes, and NOT quite what
  * java.util.regex does (Java's \b is Unicode-aware even without
  * UNICODE_CHARACTER_CLASS: 'é' is a Java word char, so java regexp_count
  * finds no match in "ABé" where RE2 finds "AB"). The regexp_count
  * carriers hold the Java answer and stay oracle-green only because no
  * fixture text puts non-ASCII adjacent to a word island; this kernel
  * computes the ORACLE's answer, resolving the latent divergence toward
  * RE2. TextStatsSpec keeps the six java.util.regex counts (ASCII-
  * sanitized for the two \b patterns) as the golden cross-check on
  * adversarial random strings (the WinnowExpr discipline) and pins the
  * divergence case explicitly.
  */
case class TextStatsExpr(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "text_stats"

  override protected def nullSafeEval(a: Any): Any =
    TextStatsExpr.compute(a.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = org.apache.spark.sql.graft.TextStatsExpr.compute($a);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object TextStatsExpr {

  private val Stopwords: Array[Array[Byte]] =
    Array("the", "a", "of", "and", "to", "in").map(_.getBytes("UTF-8"))

  @inline private def isSep(b: Byte): Boolean =
    b == ' ' || b == '\t' || b == '\n' || b == '\f' || b == '\r'
  @inline private def isWord(b: Byte): Boolean =
    (b >= 'a' && b <= 'z') || (b >= 'A' && b <= 'Z') ||
      (b >= '0' && b <= '9') || b == '_'
  @inline private def isUpper(b: Byte): Boolean = b >= 'A' && b <= 'Z'

  def compute(s: UTF8String): ArrayData = {
    // iterate via getByte — UTF8String is often a slice of a larger page,
    // so getBytes would copy the whole text per row (ADVICE r14)
    val n = s.numBytes()
    var words = 0L; var nonspace = 0L; var sym = 0L; var digit = 0L
    var caps = 0L; var stop = 0L; var punct = 0L; var subtok = 0L
    var inRun = false // inside a non-separator run (n_words)
    var island = -1 // start of the current word-char island, -1 outside
    var islandUpper = true // island so far all [A-Z]
    var alnumLen = 0 // current [A-Za-z0-9] island length (n_subtok)
    var i = 0
    while (i <= n) {
      val b: Byte = if (i < n) s.getByte(i) else ' ' // virtual trailing separator
      val cont = (b & 0xC0) == 0x80 // UTF-8 continuation byte
      val alnum = (b >= 'a' && b <= 'z') || (b >= 'A' && b <= 'Z') ||
        (b >= '0' && b <= '9')
      // n_subtok: ceil(len/4) per alnum island; any other non-separator
      // code point is one piece (lead bytes only — continuations follow
      // a lead that already closed the island and counted)
      if (alnum) alnumLen += 1
      else {
        if (alnumLen > 0) { subtok += (alnumLen + 3L) / 4L; alnumLen = 0 }
        if (i < n && !isSep(b) && !cont) subtok += 1L
      }
      if (i < n && !isSep(b)) {
        if (!inRun) { words += 1L; inRun = true }
        if (!cont) nonspace += 1L
        b match {
          case '#' | '@' | '%' | '^' | '*' | '_' | '~' | '|' => sym += 1L
          case _ => ()
        }
        if (b >= '0' && b <= '9') digit += 1L
        b match {
          case '.' | ',' | '!' | '?' | ';' | ':' => punct += 1L
          case _ => ()
        }
      } else if (i < n) inRun = false
      // word-char islands close on ANY non-word byte (incl. separators,
      // symbols, and multi-byte sequences) or at end-of-string
      if (i < n && isWord(b)) {
        if (island < 0) { island = i; islandUpper = true }
        if (!isUpper(b)) islandUpper = false
      } else if (island >= 0) {
        val len = i - island
        if (islandUpper && len >= 2) caps += 1L
        if (len <= 3) {
          var k = 0
          var found = false
          while (k < Stopwords.length && !found) {
            val w = Stopwords(k)
            if (w.length == len) {
              var j = 0
              while (j < len && s.getByte(island + j) == w(j)) j += 1
              found = j == len
            }
            k += 1
          }
          if (found) stop += 1L
        }
        island = -1
      }
      i += 1
    }
    new GenericArrayData(
      Array(words, nonspace, sym, digit, caps, stop, punct, subtok))
  }

  /** `text_stats(textCol)` as a Column. */
  def column(text: Column): Column =
    ExpressionUtils.column(TextStatsExpr(ExpressionUtils.expression(text)))
}
