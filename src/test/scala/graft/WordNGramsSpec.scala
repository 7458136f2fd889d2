package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.WordNGrams
import graft.operators.Dedup

/** WordNGrams (custom Generator / UDTF SPI example) must match the HOF
  * shingle pipeline row-for-row, including the edges the HOF form pins:
  * empty text (no tokens → nothing at n=1, ONE "" shingle at n≥2), text
  * shorter than n (one whole-text shingle), and multi-space runs. */
class WordNGramsSpec extends SparkTestBase {
  import spark.implicits._

  private val docs = Seq(
    (1L, "the quick brown fox"),
    (2L, "one"),
    (3L, ""),
    (4L, "   "),
    (5L, "a  b\tc\nd"),
    (6L, "x y")).toDF("doc_id", "text")

  private def viaHof(n: Int) = docs
    .select(col("doc_id"), graft.ops.TextQueries.tokens(col("text")).as("_t"))
    .select(col("doc_id"), explode(Dedup.shinglesFromTokens(col("_t"), n)).as("t"))

  private def viaGen(n: Int) = docs
    .select(col("doc_id"), WordNGrams.column(col("text"), n).as("t"))

  test("generator == HOF shingles on every edge case, n = 1..4") {
    for (n <- 1 to 4) {
      val a = viaHof(n).collect().map(r => (r.getLong(0), r.getString(1)))
        .sorted.toSeq
      val b = viaGen(n).collect().map(r => (r.getLong(0), r.getString(1)))
        .sorted.toSeq
      assert(a == b, s"n=$n\nhof=$a\ngen=$b")
    }
  }

  test("generator == HOF shingles on the fixture corpus (n=3)") {
    val real = Tables.documents(spark, sfDir).limit(200)
    val a = real
      .select(col("doc_id"), graft.ops.TextQueries.tokens(col("text")).as("_t"))
      .select(col("doc_id"), explode(Dedup.shinglesFromTokens(col("_t"), 3)).as("t"))
      .groupBy().agg(count(lit(1)), bit_xor(xxhash64(col("doc_id"), col("t"))))
      .collect()(0)
    val b = real
      .select(col("doc_id"), WordNGrams.column(col("text"), 3).as("t"))
      .groupBy().agg(count(lit(1)), bit_xor(xxhash64(col("doc_id"), col("t"))))
      .collect()(0)
    assert(a == b)
  }
}
