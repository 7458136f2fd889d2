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
    // A failed query must never flatter the bench as a ~0s win: record the
    // error per-query, surface it on stderr, and emit it in the JSON line.
    // Optional comma-separated subset for standalone measurement
    // (e.g. SPARK_GRAFT_QUERIES=q60_winnowing_pairs,q11_clean_project).
    val only = sys.env.get("SPARK_GRAFT_QUERIES")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    val selected = only.fold(SparkEntry.queries)(s =>
      SparkEntry.queries.filter { case (k, _) => s(k) })
    // Per-query GC seconds make any environment-driven inflation
    // self-diagnosing in the artifact (r2's driver run recorded q60 at
    // 84.9s vs 6.8s reproduced — unexplainable after the fact without
    // this breakdown).
    def gcMillis: Long = {
      import scala.jdk.CollectionConverters._
      java.lang.management.ManagementFactory.getGarbageCollectorMXBeans
        .asScala.map(_.getCollectionTime.max(0L)).sum
    }
    val results = selected.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      val gc0 = gcMillis
      val err = try { drain(fn(spark, sfDir)); None } catch {
        case e: Throwable =>
          System.err.println(s"BENCH FAILURE $name: ${e.getClass.getName}: ${e.getMessage}")
          Some(s"${e.getClass.getName}: ${String.valueOf(e.getMessage).take(200)}")
      }
      val dt = (System.nanoTime() - t0) / 1e9
      // Release THIS query's persisted subtrees before the next one runs:
      // 89 queries × MEMORY_AND_DISK persists otherwise accumulate for the
      // whole session, and storage-memory churn lands on whichever query
      // runs late (the long-tail inflation mechanism the driver records).
      // Outside the timer: cleanup is bookkeeping, not query cost.
      // OperatorCaches.release (not catalog.clearCache): drops exactly the
      // graft-created persists — the library caller contract under test.
      OperatorCaches.release()
      (name, dt, (gcMillis - gc0) / 1e3, err)
    }
    def jstr(s: String): String =
      "\"" + s.flatMap {
        case '"' => "\\\""
        case '\\' => "\\\\"
        case c if c < ' ' => f"\\u${c.toInt}%04x"
        case c => c.toString
      } + "\""
    def r3(v: Double): String = f"$v%.3f"
    // The harness captures only the LAST ~2000 chars of output, so the
    // stdout line must stay compact or early queries fall off the record
    // (round 3's did): qNN keys, 3-decimal seconds, gc only where ≥ 0.1s.
    // The full-precision, full-name record goes to BENCH_FULL.json.
    def shortK(k: String): String = k.takeWhile(_ != '_')
    val qs = results.map { case (k, v, _, _) => "\"" + shortK(k) + "\":" + r3(v) }
      .mkString("{", ",", "}")
    val gcs = results.collect { case (k, _, g, _) if g >= 0.1 =>
        "\"" + shortK(k) + "\":" + r3(g) }
      .mkString("{", ",", "}")
    val errs = results.collect { case (k, _, _, Some(e)) => "\"" + shortK(k) + "\":" + jstr(e) }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    val fullQs = results.map { case (k, v, _, _) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val fullGcs = results.map { case (k, _, g, _) => "\"" + k + "\":" + g }
      .mkString("{", ",", "}")
    val fullErrs = results.collect { case (k, _, _, Some(e)) => "\"" + k + "\":" + jstr(e) }
      .mkString("{", ",", "}")
    val full = s"""{"metric":"total","value":$total,"unit":"sec","queries":$fullQs,"gc_sec":$fullGcs,"errors":$fullErrs,"sf":"$sfDir"}"""
    // Only a FULL run may replace the full-session record: a standalone
    // SPARK_GRAFT_QUERIES subset re-measure must not clobber the 91-query
    // artifact with a 1-query file (that exact loss happened once).
    if (only.isEmpty) {
      try {
        java.nio.file.Files.write(java.nio.file.Paths.get("BENCH_FULL.json"),
          (full + "\n").getBytes("UTF-8"))
      } catch { case e: Throwable =>
        System.err.println(s"BENCH_FULL.json write failed: $e") }
    }
    println(s"""{"metric":"total","value":${r3(total)},"unit":"sec","queries":$qs,"gc_sec":$gcs,"errors":$errs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
