package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** One shared SparkSession for the whole forked test JVM. */
trait SparkTestBase extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestBase.session
  val sfDir = "/root/testdata/sf0.001"

  /** Run `body` with codegen fallback disabled: a generated-Java compile
    * error in a custom kernel then THROWS instead of silently degrading
    * the whole stage to the interpreted path (which would pass a
    * value-only assertion while killing the hot-path perf the kernel
    * exists for). */
  def strictCodegen[T](body: => T): T = {
    val prev = spark.conf.getOption("spark.sql.codegen.fallback")
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try body
    finally prev match {
      case Some(v) => spark.conf.set("spark.sql.codegen.fallback", v)
      case None => spark.conf.unset("spark.sql.codegen.fallback")
    }
  }

  /** Collect nodes across AQE boundaries: AdaptiveSparkPlanExec and
    * QueryStageExec hide their subtrees from plain `collect`. */
  def deepCollect[T](p: org.apache.spark.sql.execution.SparkPlan)(
      f: PartialFunction[org.apache.spark.sql.execution.SparkPlan, T]): Seq[T] =
    p.collect {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        deepCollect(a.executedPlan)(f)
      case s: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
        deepCollect(s.plan)(f) ++ f.lift(s).toSeq
      case n if f.isDefinedAt(n) => Seq(f(n))
    }.flatten
}

object SparkTestBase {
  lazy val session: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-tests")
      .config("spark.sql.warehouse.dir",
        java.nio.file.Files.createTempDirectory("graft-wh").toString)
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
