package graft

import java.util.regex.Pattern

import scala.util.Random

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.StopCountsExpr
import org.apache.spark.unsafe.types.UTF8String

/** StopCountsExpr vs the java.util.regex `\b(alternation)\b` counts it
  * replaced at the q28/q45 stop-set and q29/q138 language-marker sites —
  * the TextStatsSpec discipline: an ASCII-sanitized java-regex golden
  * (Java's \b is Unicode-aware, RE2's — which the DuckDB oracle executes
  * and the kernel implements — is ASCII-only), adversarial random
  * strings, the fixture corpus, and the divergence case pinned. */
class StopCountsSpec extends SparkTestBase {
  import spark.implicits._

  private val sets = Seq(
    Seq("the", "a", "of", "and"), // q28/q45 stop set
    Seq("the", "a", "is", "of"), // q29/q138 en markers
    Seq("der", "die", "und", "ist"),
    Seq("el", "los", "es", "y"),
    Seq("le", "les", "est", "et"))

  private val pats = sets.map(ws =>
    Pattern.compile("\\b(" + ws.mkString("|") + ")\\b"))

  private def count(p: Pattern, s: String): Long = {
    val m = p.matcher(s); var c = 0L
    while (m.find()) c += 1
    c
  }

  /** Golden: java.util.regex over an ASCII-SANITIZED copy (non-ASCII →
    * '#', an ASCII non-word char in both engines), which makes Java's
    * Unicode \b agree with the RE2 semantics the kernel implements. */
  private def golden(s: String): Seq[Long] = {
    val ascii = s.map(c => if (c < 128) c else '#')
    pats.map(count(_, ascii))
  }

  private def kernel(s: String): Seq[Long] =
    new org.apache.spark.sql.graft.StopSetMatcher(sets.map(_.toArray).toArray)
      .count(UTF8String.fromString(s)).toLongArray().toSeq

  private val pieces = Vector(
    "the", "a", "of", "and", "is", "der", "die", "und", "ist", "el",
    "los", "es", "y", "le", "les", "est", "et", "theory", "band",
    "lest", "established", "yes", "undo", "derby", "THE", "The",
    "é", "héllo", "模型", "是", "x", "_", "#", "1", "a1", "_a",
    " ", "\t", "\n", ".", ",", "-", "a-b", "the.", "(a)", "éthe",
    "theé", "y·y", "es,es")

  test("kernel == sanitized-java-regex golden on adversarial random strings") {
    for (seed <- 1 to 40) {
      val rnd = new Random(seed)
      val s = Seq.fill(rnd.nextInt(60))(pieces(rnd.nextInt(pieces.size)))
        .mkString("")
      assert(kernel(s) === golden(s), s"seed=$seed text=${s.take(120)}")
    }
  }

  test("kernel == golden on edge strings") {
    for (s <- Seq("", " ", "the", "a", "y", "yy", "the the", "athe",
        "thea", "the-a", "éa", "aé", "éaé", "the é the", "estest",
        "es es", "_the_", "the_", "9y", "y9", "是y是")) {
      assert(kernel(s) === golden(s), s"text=<$s>")
    }
  }

  test("kernel == golden AND == unsanitized java regex on every fixture " +
    "document (the fixtures contain no divergent adjacency)") {
    val texts = Tables.documents(spark, sfDir)
      .select("text").collect().map(_.getString(0))
    texts.foreach { t =>
      assert(kernel(t) === golden(t))
      assert(kernel(t) === pats.map(count(_, t)))
    }
  }

  test("the q28/q29 latent java-\\b divergence is resolved TOWARD the " +
    "oracle: non-ASCII adjacent to a marker island") {
    // RE2 (DuckDB): 'é' is not a word char, so "theé" contains the
    // island "the" → 1 match; java.util.regex: 'é' IS a word char, the
    // island is "theé" → 0 matches. The kernel answers as the oracle.
    assert(kernel("theé")(0) === 1L)
    assert(count(pats(0), "theé") === 0L)
    assert(kernel("éy")(3) === 1L) // es-marker 'y' flanked by non-ASCII
    assert(count(pats(3), "éy") === 0L)
  }

  test("codegen path matches interpreted through a DataFrame under strictCodegen") {
    val data = (1 to 20).map(i => (i.toLong,
      Seq.fill(6)(pieces((i * 7 + 3) % pieces.size)).mkString(" ")))
    val got = strictCodegen {
      data.toDF("id", "t")
        .withColumn("sc", StopCountsExpr.column(col("t"), sets))
        .orderBy(col("id")).collect().map(_.getSeq[Long](2))
    }
    data.zip(got).foreach { case ((_, t), sc) => assert(sc === golden(t)) }
  }

  test("single() returns the bare first-set count") {
    val got = strictCodegen {
      Seq("the cat and a dog").toDF("t")
        .select(StopCountsExpr.single(col("t"), Seq("the", "a", "of", "and"))
          .as("n")).collect()(0).getLong(0)
    }
    assert(got === 3L)
  }

  test("malformed set contracts refuse construction") {
    intercept[IllegalArgumentException] {
      StopCountsExpr.column(col("t"), Seq(Seq.empty[String]))
    }
    intercept[IllegalArgumentException] {
      StopCountsExpr.column(col("t"), Seq(Seq("héllo")))
    }
    intercept[IllegalArgumentException] {
      StopCountsExpr.column(col("t"), Seq(Seq("the", "the")))
    }
  }
}
