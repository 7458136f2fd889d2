package graft

import scala.util.Random

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.FreqSketch

import graft.ops.TextQueries

/** FreqSketch (Misra-Gries) + the exact heavy-hitters operator built on it.
  * The sketch's candidate set is partition-dependent by design; the
  * guarantees under test are (a) superset of true heavy items even with
  * heavy eviction, (b) the two-pass operator's output is EXACT and
  * partition-independent, (c) the aggregate composes under groupBy.
  */
class FreqSketchSpec extends SparkTestBase {
  import spark.implicits._

  /** Zipf-ish skewed stream: item k has weight ~ 1/(k+1). */
  private def stream(seed: Long, n: Int, domain: Int): Seq[String] = {
    val rnd = new Random(seed)
    val weights = (0 until domain).map(k => 1.0 / (k + 1))
    val cum = weights.scanLeft(0.0)(_ + _).tail
    val total = cum.last
    Seq.fill(n) {
      val u = rnd.nextDouble() * total
      s"item${cum.indexWhere(u <= _)}"
    }
  }

  test("MG superset guarantee holds under eviction and arbitrary merges") {
    for (seed <- 1 to 4) {
      val n = 5000
      val m = 32
      val xs = stream(seed, n, domain = 600) // domain >> m: eviction fires
      for (parts <- Seq(1, 7)) {
        val cands = xs.toDF("t").repartition(parts)
          .agg(FreqSketch.of(col("t"), m))
          .collect()(0).getSeq[String](0).toSet
        val exact = xs.groupBy(identity).map { case (k, v) => (k, v.size) }
        val mustKeep = exact.collect { case (k, c) if c > n / (m + 1) => k }
        assert(mustKeep.forall(cands), s"seed=$seed parts=$parts: " +
          s"missing ${mustKeep.filterNot(cands)}")
        assert(cands.size <= m, s"seed=$seed parts=$parts")
      }
    }
  }

  test("heavyHitters output is exact and partition-independent") {
    for (seed <- 10 to 12) {
      val xs = stream(seed, 4000, domain = 400)
      val denom = 100 // keep items with count*100 >= n
      val exact = xs.groupBy(identity).map { case (k, v) => (k, v.size.toLong) }
        .filter { case (_, c) => c * denom >= xs.size }
        .toSeq.sortBy { case (k, c) => (-c, k) }
      for (parts <- Seq(1, 13)) {
        val got = TextQueries.heavyHitters(
          xs.toDF("token").repartition(parts), "token", denom, m = 128)
          .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
        assert(got == exact, s"seed=$seed parts=$parts")
        graft.OperatorCaches.release()
      }
    }
  }

  test("capacity below the support denominator is rejected") {
    intercept[IllegalArgumentException] {
      TextQueries.heavyHitters(Seq("a").toDF("token"), "token",
        supportDenom = 500, m = 100)
    }
  }

  test("sketch composes under groupBy and partial aggregation") {
    val df = Seq.tabulate(300)(i => (s"g${i % 2}", s"w${i % 3}"))
      .toDF("g", "t").repartition(5)
    val rows = df.groupBy(col("g")).agg(FreqSketch.of(col("t"), 8).as("cands"))
      .collect().map(r => r.getString(0) -> r.getSeq[String](1).toSet).toMap
    // domain (3) fits the capacity (8): no eviction, candidates are exact
    assert(rows("g0") == Set("w0", "w1", "w2"))
    assert(rows("g1") == Set("w0", "w1", "w2"))
  }

  test("q95 matches the plain groupBy/HAVING computation on the fixture") {
    val got = TextQueries.q95(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    val tok = Tables.documents(spark, sfDir)
      .select(explode(TextQueries.tokens(col("text"))).as("token"))
    val total = tok.count()
    val exact = tok.groupBy(col("token")).agg(count(lit(1)).as("n"))
      .where(col("n") * 500 >= total)
      .orderBy(desc("n"), col("token"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got == exact)
    assert(got.nonEmpty)
    graft.OperatorCaches.release()
  }
}
