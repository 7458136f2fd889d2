package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.MergePercentiles

/** MergePercentiles optimizer rule: N scalar percentile calls over the
  * same column fuse into one array-percentile buffer, bit-identical
  * results. */
class MergePercentilesSpec extends SparkTestBase {
  import spark.implicits._

  /** Number of DISTINCT percentile buffers the plan will build (the same
    * merged aggregate prints once per extract site, so counting text
    * occurrences overcounts). */
  private def percCount(df: org.apache.spark.sql.DataFrame): Int = {
    import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Percentile}
    df.queryExecution.optimizedPlan
      .collect { case n => n.expressions }.flatten
      .flatMap(_.collect {
        case ae: AggregateExpression
            if ae.aggregateFunction.isInstanceOf[Percentile] => ae.resultId
      })
      .distinct.size
  }

  private val data = Seq.tabulate(1000)(i => (i % 3, (i * 37 % 997).toDouble))

  test("four scalar percentiles fuse to one buffer; results unchanged") {
    MergePercentiles.ensure(spark)
    val df = data.toDF("k", "v")
      .groupBy($"k")
      .agg(
        expr("percentile(v, 0.25)").as("p25"),
        expr("percentile(v, 0.5)").as("p50"),
        expr("percentile(v, 0.75)").as("p75"),
        expr("percentile(v, 0.99)").as("p99"))
      .orderBy($"k")
    assert(percCount(df) == 1, df.queryExecution.optimizedPlan)

    // ground truth from a session WITHOUT the rule: same literal plan text
    val before = spark.experimental.extraOptimizations
    try {
      spark.experimental.extraOptimizations =
        before.filterNot(_ == MergePercentiles)
      val plain = data.toDF("k", "v")
        .groupBy($"k")
        .agg(
          expr("percentile(v, 0.25)").as("p25"),
          expr("percentile(v, 0.5)").as("p50"),
          expr("percentile(v, 0.75)").as("p75"),
          expr("percentile(v, 0.99)").as("p99"))
        .orderBy($"k")
      assert(percCount(plain) == 4, "control must stay unfused")
      assert(df.collect().toSeq == plain.collect().toSeq)
    } finally spark.experimental.extraOptimizations = before
  }

  test("mixed columns fuse per column; distinct/filter forms left alone") {
    MergePercentiles.ensure(spark)
    val df = data.toDF("k", "v")
      .withColumn("w", $"v" * 2)
      .groupBy($"k")
      .agg(
        expr("percentile(v, 0.1)").as("a"),
        expr("percentile(v, 0.9)").as("b"),
        expr("percentile(w, 0.5)").as("c"),
        expr("percentile(DISTINCT v, 0.5)").as("d"))
      .orderBy($"k")
    // v-pair fuses into one; w (single) and DISTINCT v stay scalar
    assert(percCount(df) == 3, df.queryExecution.optimizedPlan)
    val rows = df.collect()
    assert(rows.length == 3 && rows.forall(r => !r.anyNull))
  }

  test("repeated identical percentage reuses one array slot") {
    MergePercentiles.ensure(spark)
    val df = data.toDF("k", "v")
      .groupBy($"k")
      .agg(
        expr("percentile(v, 0.5)").as("a"),
        expr("percentile(v, 0.5)").as("b"),
        expr("percentile(v, 0.75)").as("c"))
    assert(percCount(df) == 1, df.queryExecution.optimizedPlan)
    val r = df.orderBy($"k").collect()
    assert(r.forall(row => row.getDouble(1) == row.getDouble(2)))
  }
}
