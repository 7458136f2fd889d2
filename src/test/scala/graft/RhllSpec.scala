package graft

import org.apache.spark.sql.functions._

/** The replayable-HLL engine itself (ops.Rhll): rank arithmetic against
  * the JVM's leading-zero count, the merge law, and estimate accuracy on
  * BOTH branches (linear counting at low cardinality, integer raw
  * estimate at high) — the envelope the q152–q155 family rides on. */
class RhllSpec extends SparkTestBase {

  private def registers(n: Long) = {
    val h = xxhash64(col("id"))
    spark.range(n)
      .select(ops.Rhll.bucket(h).as("bucket"), ops.Rhll.rank(h).as("r0"))
      .groupBy(col("bucket")).agg(max(col("r0")).as("r"))
      .withColumn("g", lit(1))
  }

  private def estOf(n: Long): Double =
    ops.Rhll.estimate(registers(n), Seq("g"), 52, "est")
      .head.getAs[Double]("est")

  test("rank = clz of the 52-bit suffix + 1 (bin-length arithmetic is exact)") {
    import spark.implicits._
    // probe hashes covering every suffix bit position + the all-zero edge
    val probes = (0 until 52).map(i => 1L << i) ++
      Seq(0L, -1L, Long.MinValue, 4503599627370495L, 1234567890123L)
    val got = probes.toDF("h")
      .select(col("h"), ops.Rhll.rank(col("h")).as("r"),
        ops.Rhll.bucket(col("h")).as("b"))
      .collect().map(r => r.getLong(0) -> ((r.getInt(1), r.getLong(2)))).toMap
    probes.foreach { h =>
      val suffix = h & ((1L << 52) - 1)
      val expectR =
        if (suffix == 0L) 53
        else java.lang.Long.numberOfLeadingZeros(suffix) - 12 + 1
      val (r, b) = (got(h)._1, got(h)._2)
      assert(r == expectR, s"h=$h suffix=$suffix rank $r != $expectR")
      assert(b == (h >>> 52), s"h=$h bucket $b != ${h >>> 52}")
    }
  }

  test("merge law: max-merged half-registers estimate == single-pass estimate") {
    val h = xxhash64(col("id"))
    def half(lo: Long, hi: Long) = spark.range(lo, hi)
      .select(ops.Rhll.bucket(h).as("bucket"), ops.Rhll.rank(h).as("r0"))
      .groupBy(col("bucket")).agg(max(col("r0")).as("r"))
    val merged = half(0, 9000).unionByName(half(3000, 20000))
      .groupBy(col("bucket")).agg(max(col("r")).as("r"))
      .withColumn("g", lit(1))
    val single = registers(20000)
    val a = ops.Rhll.estimate(merged, Seq("g"), 52, "est").head.getDouble(1)
    val b = ops.Rhll.estimate(single, Seq("g"), 52, "est").head.getDouble(1)
    assert(a == b, s"merged $a != single-pass $b")
  }

  test("linear-counting branch: low cardinality within 5%") {
    for (n <- Seq(100L, 1000L, 5000L)) {
      val e = estOf(n)
      assert(math.abs(e - n) <= math.max(2.0, n * 0.05), s"n=$n est=$e")
    }
  }

  test("raw integer branch: high cardinality within 5% and integer-valued") {
    for (n <- Seq(50000L, 300000L)) {
      val e = estOf(n)
      assert(math.abs(e - n) <= n * 0.05, s"n=$n est=$e")
      // past the 2.5m cutover the estimate is the exact integral division
      assert(e == math.floor(e), s"raw-path estimate must be integral: $e")
    }
  }
}
