package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.WinnowExpr
import org.apache.spark.unsafe.types.UTF8String

/** WinnowExpr (the q42/q60 kernel) must be BIT-IDENTICAL to the staged
  * HOF pipeline it replaced — gram hash = xxhash64(substr(text, i, k)),
  * slice+array_min window minima, array_distinct first-occurrence dedup,
  * whole-text min for short docs — because the q42 DuckDB oracle
  * (Xxh64Sql) replays exactly those hash values. The HOF form is kept
  * HERE as the golden reference. */
class WinnowExprSpec extends SparkTestBase {
  import spark.implicits._

  /** The pre-kernel declarative formulation, verbatim. */
  private def hofForm(textCol: Column, k: Int, w: Int): Column = {
    val nGrams = length(textCol) - (k - 1)
    val grams = when(nGrams < 1, array().cast("array<bigint>"))
      .otherwise(transform(sequence(lit(1), nGrams),
        i => xxhash64(textCol.substr(i, lit(k)))))
    grams
  }

  private def hofFingerprints(df: org.apache.spark.sql.DataFrame, k: Int,
      w: Int): org.apache.spark.sql.DataFrame = {
    val staged = df.select(col("doc_id"),
      hofForm(col("text"), k, w).as("_grams"))
    val nG = size(col("_grams"))
    val nWin = greatest(nG - (w - 1), lit(0))
    val mins = when(nWin < 1, array().cast("array<bigint>"))
      .otherwise(transform(sequence(lit(0), nWin - 1),
        j => array_min(slice(col("_grams"), j + 1, lit(w)))))
    staged.select(col("doc_id"),
      when(nG === 0, array().cast("array<bigint>"))
        .otherwise(when(nWin === 0, array(array_min(col("_grams"))))
          .otherwise(array_distinct(mins))).as("fingerprints"))
  }

  test("kernel == staged-HOF golden form on edges and the fixture corpus") {
    val edges = Seq(
      (0L, ""),                      // empty → no fingerprints
      (1L, "short"),                 // < k chars → no grams
      (2L, "exactly8"),              // exactly one gram → one fp
      (3L, "ninechars"),             // 2 grams < w → whole-text min
      (4L, "elevenchars"),           // 4 grams = w → one window
      (5L, "aaaaaaaaaaaaaaaa"),      // all grams identical → dedup to 1
      (6L, "naïve—unicode £ text with multibyte characters throughout"),
      (7L, "the quick brown fox jumps over the lazy dog again and again"))
      .toDF("doc_id", "text")
    val corpus = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text")).limit(200)
    for (df <- Seq(edges, corpus); (k, w) <- Seq((8, 4), (5, 3))) {
      val kern = graft.operators.Dedup
        .winnowingFingerprints(df, "text", "doc_id", k, w)
        .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toSeq).toMap
      val gold = hofFingerprints(df, k, w)
        .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toSeq).toMap
      assert(kern == gold, s"kernel != golden HOF form at k=$k w=$w")
    }
  }

  test("interpreted eval matches codegen path") {
    val texts = Seq("", "short", "the quick brown fox jumps over the lazy")
    texts.foreach { t =>
      val interp = WinnowExpr(Literal(UTF8String.fromString(t),
          org.apache.spark.sql.types.StringType), 8, 4)
        .eval(null).asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
        .toLongArray().toSeq
      val viaDf = Seq((1L, t)).toDF("doc_id", "text")
        .select(WinnowExpr.column(col("text"), 8, 4)).collect()(0)
        .getSeq[Long](0).toSeq
      assert(interp == viaDf, s"eval != codegen for '$t'")
    }
    assert(WinnowExpr(Literal.create(null,
      org.apache.spark.sql.types.StringType), 8, 4).eval(null) == null)
  }
}
