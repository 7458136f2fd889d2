package graft

import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.RepCovsExpr
import org.apache.spark.sql.types.{ArrayType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** RepCovsExpr (the q193 kernel) — interpreted and codegen paths must
  * agree with a naive Scala model of the coverage definitions, including
  * the split-artifact contract (empty tokens skipped) and degenerate
  * inputs (short docs, empty arrays, null elements). */
class RepCovsSpec extends SparkTestBase {
  import spark.implicits._

  /** Naive model: group grams by their STRING value (the oracle's view —
    * the kernel groups by digest, equal modulo 64-bit collisions). */
  private def model(tokens: Seq[String]): Seq[Long] = {
    val toks = tokens.filter(_.nonEmpty)
    RepCovsExpr.Widths.toSeq.map { w =>
      if (toks.length < w) 0L
      else {
        val grams = (0 to toks.length - w)
          .map(i => toks.slice(i, i + w).mkString(" "))
        val counts = grams.groupBy(identity).toSeq.map { case (g, occ) =>
          (occ.length.toLong, g.length.toLong)
        }
        if (w <= 4) counts.map { case (c, l) => c * l }.max
        else counts.collect { case (c, l) if c >= 2 => c * l }.sum
      }
    }
  }

  test("kernel == naive model on planted and random token streams") {
    val rnd = new scala.util.Random(11L)
    val vocab = Vector("a", "bb", "ccc", "dddd", "ee", "f")
    val cases: Seq[Seq[String]] =
      Seq(
        Seq.empty[String],
        Seq("solo"),
        Seq("a", "b"),
        Seq("", "a", "", "b", ""),                  // split artifacts
        Seq.fill(12)("x"),                          // maximal repetition
        Seq("a", "b", "a", "b", "a", "b")) ++
      Seq.fill(25)(Seq.fill(3 + rnd.nextInt(40))(vocab(rnd.nextInt(vocab.size))))
    val out = cases.map(c => (c, 0)).toDF("toks", "i")
      .select(RepCovsExpr.column(col("toks")).as("cv"))
      .collect()
      .map(_.getSeq[Long](0).toSeq)
    cases.indices.foreach { i =>
      assert(out(i) == model(cases(i)),
        s"codegen mismatch on ${cases(i)}: ${out(i)} vs ${model(cases(i))}")
    }
    // interpreted path (direct eval, no codegen)
    cases.foreach { c =>
      val lit = Literal.create(
        ArrayData.toArrayData(c.map(UTF8String.fromString).toArray),
        ArrayType(StringType, true))
      val got = RepCovsExpr(lit).eval(null).asInstanceOf[ArrayData]
        .toLongArray().toSeq
      assert(got == model(c), s"interpreted mismatch on $c")
    }
  }

  test("repetitionSignals == string-keyed brute model over seeded random " +
    "corpora (r13 verdict ask: guards the digest-vs-string grouping " +
    "asymmetry beyond the planted-doc pins, the WinnowExprSpec discipline)") {
    // end-to-end through Curation.repetitionSignals: the split regex, the
    // kernel, and the column wiring all face the model — which groups
    // grams by their literal STRING (the oracle's view), not the kernel's
    // chained-XXH64 digests.
    for (seed <- 1 to 24) {
      val rnd = new scala.util.Random(seed.toLong)
      val vocab = Vector("a", "bb", "ccc", "dddd", "ee", "f", "gg", "hhh")
      val seps = Vector(" ", "  ", "\t", " \t ")
      def phrase(n: Int): Seq[String] =
        Seq.fill(n)(vocab(rnd.nextInt(vocab.size)))
      val docs = (0L until 30L).map { id =>
        // dup-heavy: ~40% of docs embed a phrase repeated 2-4× back to
        // back (forces the count>=2 dup paths and max-product top paths)
        val base = phrase(3 + rnd.nextInt(25))
        val toks =
          if (rnd.nextDouble() < 0.4) {
            val p = phrase(2 + rnd.nextInt(10))
            base ++ Seq.fill(2 + rnd.nextInt(3))(p).flatten
          } else base
        val text = toks.map(t => t + seps(rnd.nextInt(seps.size)))
          .mkString.trim
        (id, s"src${id % 3}", text.length.toLong, text)
      }
      val got = graft.ops.Curation.repetitionSignals(
          docs.toDF("doc_id", "source", "n_chars", "text"))
        .collect()
        .map(r => r.getLong(0) ->
          Seq(r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6),
            r.getLong(7)))
        .toMap
      docs.foreach { case (id, _, _, text) =>
        val m = model(text.split("[\\t\\n\\f\\r ]+").toSeq)
        assert(got(id) == m, s"seed=$seed doc=$id text='$text': " +
          s"${got(id)} vs $m")
      }
    }
  }

  test("null handling: null array -> null; null elements skipped like empties") {
    assert(RepCovsExpr(Literal.create(null, ArrayType(StringType, true)))
      .eval(null) == null)
    val withNull = Literal.create(
      ArrayData.toArrayData(Array[AnyRef](UTF8String.fromString("a"), null,
        UTF8String.fromString("a"))),
      ArrayType(StringType, true))
    // null slot skipped -> tokens (a, a) -> one "a a" 2-gram, cov2 = 3
    val got = RepCovsExpr(withNull).eval(null).asInstanceOf[ArrayData]
      .toLongArray().toSeq
    assert(got == Seq(3L, 0L, 0L, 0L, 0L), got.toString)
  }
}
