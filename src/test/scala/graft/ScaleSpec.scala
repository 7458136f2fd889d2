package graft

import org.apache.spark.sql.functions._
import graft.ops.Scale

class ScaleSpec extends SparkTestBase {

  test("salted aggregation ≡ direct aggregation (counts and money sums)") {
    val li = Tables.lineitem(spark, sfDir)
    val direct = li.groupBy(col("l_returnflag")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val salted = Scale.saltedCount(li, "l_returnflag", 16)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(salted == direct)

    val directSum = li.groupBy(col("l_returnflag"))
      .agg((sum(round(col("l_extendedprice") * 100)) / 100.0).as("total"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val saltedSum = Scale.saltedSumMoney(li, "l_returnflag", "l_extendedprice", 16)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(saltedSum == directSum, "cents sums must be bit-identical under salting")
  }

  test("bucketed join plans with zero exchanges") {
    Scale.writeBucketed(Tables.orders(spark, sfDir)
      .select("o_orderkey", "o_totalprice"), "b_orders", "o_orderkey", 8)
    Scale.writeBucketed(Tables.lineitem(spark, sfDir)
      .select("l_orderkey", "l_quantity"), "b_lineitem", "l_orderkey", 8)
    val joined = Scale.bucketedJoin(spark, "b_lineitem", "b_orders",
      "l_orderkey", "o_orderkey")
    // disable broadcast so the join would normally shuffle both sides
    val key = "spark.sql.autoBroadcastJoinThreshold"
    val old = spark.conf.get(key)
    try {
      spark.conf.set(key, "-1")
      val p = joined.queryExecution.executedPlan.toString
      assert(p.contains("SortMergeJoin"), p)
      assert(!p.contains("Exchange"),
        "same-bucketing must satisfy the join distribution with no shuffle\n" + p)
      // and the result is right
      assert(joined.count() ==
        Tables.lineitem(spark, sfDir).join(Tables.orders(spark, sfDir),
          col("l_orderkey") === col("o_orderkey")).count())
    } finally spark.conf.set(key, old)
  }

  test("approx distinct within 5% of exact at fixture scale") {
    val li = Tables.lineitem(spark, sfDir)
    val exact = li.select(countDistinct(col("l_partkey"))).head().getLong(0)
    val approx = Scale.approxDistinct(li, "l_partkey").head().getLong(0)
    assert(math.abs(approx - exact).toDouble / exact < 0.05,
      s"approx=$approx exact=$exact")
  }

  test("HashReservoir: aggregate equals window model; partition-independent") {
    import org.apache.spark.sql.expressions.Window
    val docs = Tables.documents(spark, sfDir).select("source", "doc_id")
    def viaAgg(parts: Int) =
      docs.repartition(parts)
        .groupBy(col("source"))
        .agg(org.apache.spark.sql.graft.HashReservoir.of(col("doc_id"), 3).as("ids"))
        .select(col("source"), explode(col("ids")).as("doc_id"))
        .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    val model = docs
      .withColumn("rn", row_number().over(Window.partitionBy(col("source"))
        .orderBy(sha2(col("doc_id").cast("string"), 256), col("doc_id"))))
      .filter(col("rn") <= 3).drop("rn")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    // 32-way repartition forces serialize/deserialize + partial merges;
    // 1-way exercises the single-buffer path — identical output required
    assert(viaAgg(32) == model)
    assert(viaAgg(1) == model)
  }

  test("splitOf: stable under repartitioning, near-nominal fractions, covers all splits") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.01")
      .select(col("doc_id"))
    def assign(parts: Int) = docs.repartition(parts)
      .withColumn("split", graft.ops.Scale.splitOf(col("doc_id").cast("string")))
      .collect().map(r => (r.getLong(0), r.getString(1))).toMap
    val a = assign(1)
    assert(assign(17) == a, "split assignment moved under repartitioning")
    val n = a.size.toDouble
    val frac = a.values.groupBy(identity).view.mapValues(_.size / n).toMap
    assert(math.abs(frac("train") - 204.0 / 256) < 0.04, frac.toString)
    assert(math.abs(frac("val") - 26.0 / 256) < 0.03, frac.toString)
    assert(math.abs(frac("test") - 26.0 / 256) < 0.03, frac.toString)
  }
}
