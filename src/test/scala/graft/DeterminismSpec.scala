package graft

import org.apache.spark.sql.functions._

/** The driver's rows-only check (queries with no oracle entry) is only
  * meaningful if those queries are DETERMINISTIC — same rows on every run,
  * engine restart, and partition layout. This spec pins that claim: every
  * registered query without an oracle runs twice and must produce the
  * identical multiset of rows (canonically sorted; floats compared
  * bit-for-bit since all registered forms round to fixed precision).
  */
class DeterminismSpec extends SparkTestBase {

  private def canon(df: org.apache.spark.sql.DataFrame): Seq[String] =
    // \u0001 separator: bare mkString would let ("ab","c") == ("a","bc")
    // collide into the same canon string and mask a real difference
    df.collect().map(_.mkString("\u0001")).sorted.toSeq

  test("every rows-only query is run-to-run deterministic") {
    val rowsOnly = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(rowsOnly.nonEmpty)
    val diffs = rowsOnly.toSeq.sorted.flatMap { name =>
      val fn = SparkEntry.queries(name)
      val a = canon(fn(spark, sfDir))
      OperatorCaches.release()
      val b = canon(fn(spark, sfDir))
      OperatorCaches.release()
      if (a == b) None
      else Some(s"$name: run1=${a.length} rows, run2=${b.length} rows, " +
        s"first diff: ${a.zip(b).find { case (x, y) => x != y }
          .orElse(Some((a.length.toString, b.length.toString)))}")
    }
    assert(diffs.isEmpty, diffs.mkString("\n"))
  }
}
