package graft

import org.apache.spark.sql.execution.SortExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.functions._

import graft.sources.Sources

/** S13 bucketed tables: the write-once-shuffle contract. A join of two
  * tables bucketed on their join keys, and an aggregation on the bucket
  * key, must plan with zero shuffle exchanges — and return exactly what
  * the unbucketed plans return.
  */
class BucketingSpec extends SparkTestBase {

  private def finalPlan(df: org.apache.spark.sql.DataFrame) = {
    df.count() // materialize so AQE settles on the final plan
    df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
  }

  test("bucketed-bucketed equi-join: zero exchange, same result") {
    val o = Tables.orders(spark, sfDir)
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"))
    val c = Tables.customer(spark, sfDir)
      .select(col("c_custkey"), col("c_name"))
    Sources.writeBucketed(o, "graft_orders_b", 8, Seq("o_custkey"))
    Sources.writeBucketed(c, "graft_customer_b", 8, Seq("c_custkey"))

    ScopedConf.withConf(spark, "spark.sql.autoBroadcastJoinThreshold", "-1") {
      val joined = spark.table("graft_orders_b")
        .join(spark.table("graft_customer_b"),
          col("o_custkey") === col("c_custkey"))
      val plan = finalPlan(joined)
      assert(plan.collect { case e: ShuffleExchangeExec => e }.isEmpty,
        s"bucketed join still shuffles:\n$plan")
      // Spark 3+ ignores sorted-bucket metadata by default
      // (spark.sql.legacy.bucketedTableScan.outputOrdering=false), so the
      // SMJ keeps LOCAL per-bucket sorts — CPU within a task, no network.
      // The exchange elimination is the 100 TB lever; pin that and the
      // bucketed scan itself.
      assert(plan.collect { case s: SortExec => s }.forall(
        _.outputPartitioning.numPartitions == 8),
        s"unexpected global sort:\n$plan")
      assert(plan.toString.contains("Bucketed: true"),
        s"scan is not bucketed:\n$plan")

      // integer-cents sums: order-free, so the two plans compare exactly
      val cents = sum(round(col("o_totalprice") * 100).cast("long")).as("t")
      val got = joined.groupBy(col("c_name")).agg(cents)
        .agg(count(lit(1)), sum(col("t"))).collect()(0)
      val exp = o.join(c, col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_name")).agg(cents)
        .agg(count(lit(1)), sum(col("t"))).collect()(0)
      assert(got == exp)
    }
  }

  test("groupBy on the bucket key: zero exchange, same result") {
    ScopedConf.withConf(spark, "spark.sql.autoBroadcastJoinThreshold", "-1") {
      val agg = spark.table("graft_orders_b")
        .groupBy(col("o_custkey")).agg(count(lit(1)).as("n"))
      val plan = finalPlan(agg)
      assert(plan.collect { case e: ShuffleExchangeExec => e }.isEmpty,
        s"bucketed groupBy still shuffles:\n$plan")
      val got = agg.agg(sum(col("n")), count(lit(1))).collect()(0)
      val exp = Tables.orders(spark, sfDir)
        .groupBy(col("o_custkey")).agg(count(lit(1)).as("n"))
        .agg(sum(col("n")), count(lit(1))).collect()(0)
      assert(got == exp)
    }
  }
}
