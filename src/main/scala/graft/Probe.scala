package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only latency dissector: runs one registered query N times in one
  * session and prints per-run wall plus the analysis/optimization/codegen
  * vs execution split — distinguishes a fixed driver-side planning cost
  * (amortized at scale, irrelevant at 100 TB) from real executor cost.
  * Usage:
  *   SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
  *     sbt "runMain graft.Probe q53_winnowing_sha 3"
  */
object Probe {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse(sys.error("usage: Probe <query> [n]"))
    val n = args.lift(1).map(_.toInt).getOrElse(3)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel(
      sys.env.getOrElse("SPARK_GRAFT_LOGLEVEL", "WARN"))
    spark.range(1000000).selectExpr("sum(id)").collect()
    (1 to n).foreach { run =>
      val t0 = System.nanoTime()
      val df = SparkEntry.queries(name)(spark, sfDir)
      val drained = df.select(
        xxhash64(struct(df.columns.map(col).toIndexedSeq: _*)).as("_h"))
        .agg(count(lit(1)), bit_xor(col("_h")))
      // force analysis+optimization+physical planning without executing
      drained.queryExecution.executedPlan
      val t1 = System.nanoTime()
      drained.collect()
      val t2 = System.nanoTime()
      OperatorCaches.release()
      println(f"run $run: plan ${(t1 - t0) / 1e9}%.2fs execute ${(t2 - t1) / 1e9}%.2fs")
    }
    spark.stop()
  }
}
