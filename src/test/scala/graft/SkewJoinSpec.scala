package graft

import org.apache.spark.sql.execution.joins.SortMergeJoinExec
import org.apache.spark.sql.functions._

/** AQE skew-join: the RUNTIME half of the skew story (q80's salting is the
  * static half). A hot key that would otherwise serialize one reducer gets
  * its partition split by AQE using the actual map-output sizes — no code
  * change, no salt columns. The spec pins that our conf discipline leaves
  * AQE able to do this: the SMJ is marked `isSkewJoin` after execution and
  * the result is identical to the unsplit join.
  */
class SkewJoinSpec extends SparkTestBase {
  import spark.implicits._

  test("AQE splits a skewed partition and preserves the join result") {
    // hot key 0: 40k rows; 60 cold keys: 50 rows each
    val left = spark.range(40000).select(lit(0L).as("k"), col("id").as("v"))
      .union(spark.range(3000).select((col("id") % 60 + 1).as("k"),
        col("id").as("v")))
    val right = (0L to 60L).map(k => (k, s"r$k")).toDF("k", "name")
      .repartition(4)

    def agg(df: org.apache.spark.sql.DataFrame) =
      df.agg(count(lit(1)), sum(col("v")), count(col("name"))).collect()(0)

    val expected = agg(left.join(right, "k"))

    val confs = Seq(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "64KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "32KB",
      // coalescing first would merge away the evidence at this toy size
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false")
    val got = confs.foldLeft((body: () => org.apache.spark.sql.Row) => body()) {
      (wrap, kv) => body => ScopedConf.withConf(spark, kv._1, kv._2)(wrap(body))
    } { () =>
      val j = left.join(right, "k")
        .agg(count(lit(1)), sum(col("v")), count(col("name")))
      val r = j.collect()(0)
      val plan = j.queryExecution.executedPlan
      val smjs = deepCollect(plan) { case s: SortMergeJoinExec => s }
      assert(smjs.nonEmpty, s"expected an SMJ:\n$plan")
      assert(smjs.exists(_.isSkewJoin),
        s"AQE did not mark the join skewed:\n$plan")
      r
    }
    assert(got == expected)
  }
}
