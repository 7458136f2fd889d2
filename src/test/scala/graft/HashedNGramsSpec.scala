package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.HashedNGrams
import graft.ops.TextQueries.tokens

/** Pins the r17 fused shingle-digest generator bit-exactly against the
  * HOF formulation it replaced in `Dedup.distinctHashedShingles` —
  * token hash, window fold seed-chain, short-text whole-text shingle,
  * empty text, multi-byte UTF-8, every ASCII whitespace delimiter, and
  * the per-doc dedup contract. */
class HashedNGramsSpec extends SparkTestBase {
  import spark.implicits._

  /** The pre-r17 staging, verbatim: per-token xxhash64, then window
    * digests via the interpreted transform/sequence/slice chain. */
  private def hofDigests(textCol: org.apache.spark.sql.Column, n: Int) = {
    val th = transform(tokens(textCol), t => xxhash64(t))
    if (n <= 1) th
    else when(size(th) < n, array(xxhash64(th)))
      .otherwise(transform(
        sequence(lit(0), size(th) - n),
        i => xxhash64(slice(th, i + 1, lit(n)))))
  }

  private val corpus = Seq(
    (1L, "alpha beta gamma delta epsilon zeta"),
    (2L, "alpha beta gamma"),                      // |tokens| == n for n=3
    (3L, "alpha beta"),                            // |tokens| < n
    (4L, "solo"),
    (5L, ""),                                      // empty text
    (6L, "  \t leading   and\ttrailing \r\n ws "), // ws runs, all delims
    (7L, "répété déjà vu répété déjà vu naïve"),   // multi-byte UTF-8
    (8L, "a a a a a a"),                           // heavy in-doc dup
    (9L, "xy vertical-tab is NOT whitespace here"),
    (10L, "one two three four five one two three four five"))
    .toDF("doc_id", "text")

  for (n <- Seq(1, 3, 8)) {
    test(s"HashedNGrams(n=$n) emits exactly the distinct HOF digests") {
      val fused = corpus.select(col("doc_id"),
          HashedNGrams.column(col("text"), n).as("t"))
        .collect().map(r => (r.getLong(0), r.getLong(1)))
      // per-doc distinct by construction
      assert(fused.toSet.size == fused.length,
        s"generator emitted a duplicate (doc_id, digest) at n=$n")
      val hof = corpus.select(col("doc_id"),
          explode(hofDigests(col("text"), n)).as("t"))
        .distinct()
        .collect().map(r => (r.getLong(0), r.getLong(1)))
      assert(fused.toSet == hof.toSet,
        s"digest sets diverge at n=$n")
    }
  }

  test("null text emits no rows (HOF explode-of-null parity)") {
    val df = Seq((1L, Option("a b c")), (2L, Option.empty[String]))
      .toDF("doc_id", "text")
    val fused = df.select(col("doc_id"),
        HashedNGrams.column(col("text"), 3).as("t"))
      .collect().map(_.getLong(0)).toSet
    assert(fused == Set(1L))
  }

  test("empty text at n>1 emits the single seed digest (42), matching " +
    "catalyst's hash of an empty array") {
    val one = Seq((1L, "")).toDF("doc_id", "text")
      .select(HashedNGrams.column(col("text"), 3).as("t"))
      .collect().map(_.getLong(0)).toSeq
    assert(one == Seq(42L))
  }
}
