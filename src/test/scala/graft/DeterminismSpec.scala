package graft

import org.apache.spark.sql.functions._

/** The driver's rows-only check (queries with no oracle entry) is only
  * meaningful if those queries are DETERMINISTIC — same rows on every run,
  * engine restart, and partition layout. Since r14 the rows-only set is
  * EMPTY (all 193 registered queries carry an oracle), so this spec now
  * pins two things: (a) the registry stays fully oracle-covered — a new
  * query registered without an oracle entry fails here loudly instead of
  * silently weakening the driver's check to rows-only; and (b) the
  * queries that WERE rows-only for seven rounds (the learned-state ANN
  * entries) remain run-to-run deterministic — the oracle compare hashes
  * ONE execution, this guards the second.
  */
class DeterminismSpec extends SparkTestBase {

  private def canon(df: org.apache.spark.sql.DataFrame): Seq[String] =
    // \u0001 separator: bare mkString would let ("ab","c") == ("a","bc")
    // collide into the same canon string and mask a real difference
    df.collect().map(_.mkString("\u0001")).sorted.toSeq

  test("registry is fully oracle-covered (no rows-only queries left)") {
    val rowsOnly = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(rowsOnly.isEmpty,
      s"queries registered without an oracle entry: ${rowsOnly.toSeq.sorted}")
    // and no oracle points at an unregistered query
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty, s"oracles without queries: ${orphans.toSeq.sorted}")
  }

  test("formerly rows-only learned-state queries stay run-to-run deterministic") {
    val learned = Seq("q41_ann_ivf", "q49_neardup_lsh", "q55_ann_ivf_kmeans",
      "q98_ann_pq", "q128_ann_persisted", "q158_ann_recall")
    val diffs = learned.flatMap { name =>
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
