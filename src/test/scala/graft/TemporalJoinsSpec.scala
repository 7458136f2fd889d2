package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import graft.ops.TemporalJoins

/** As-of / bounded-range join semantics (q73/q74's machinery). */
class TemporalJoinsSpec extends SparkTestBase {
  import spark.implicits._

  private def ts(sec: Long) = new Timestamp(sec * 1000L)

  private def probes(rows: (Long, Long, Long)*) = // (id, key, sec)
    rows.map { case (i, k, s) => (i, k, ts(s)) }.toDF("id", "k", "ts")

  private def builds(rows: (Long, Long, Long)*) = // (bid, key, sec)
    rows.map { case (i, k, s) => (k, ts(s), i) }.toDF("k", "bts", "bid")

  private def run(l: org.apache.spark.sql.DataFrame,
      r: org.apache.spark.sql.DataFrame) =
    TemporalJoins.asofJoin(l, r, Seq("k"), "ts", "bts")
      .orderBy("id")
      .select(col("id"), col("bid"))
      .as[(Long, Option[Long])].collect().toSeq

  test("asof picks the LATEST at-or-before build row, not just any") {
    val out = run(
      probes((1L, 7L, 100L)),
      builds((10L, 7L, 50L), (11L, 7L, 90L), (12L, 7L, 101L)))
    assert(out == Seq((1L, Some(11L))))
  }

  test("asof bound is inclusive: build at the probe's exact ts matches") {
    val out = run(
      probes((1L, 7L, 100L)),
      builds((10L, 7L, 100L)))
    assert(out == Seq((1L, Some(10L))))
  }

  test("no at-or-before build row -> null payload (left semantics)") {
    val out = run(
      probes((1L, 7L, 100L), (2L, 8L, 100L)),
      builds((10L, 7L, 200L), (11L, 9L, 50L)))
    assert(out == Seq((1L, None), (2L, None)))
  }

  test("matches never cross keys; each key tracks its own history") {
    val out = run(
      probes((1L, 7L, 100L), (2L, 8L, 100L)),
      builds((10L, 7L, 10L), (11L, 8L, 99L), (12L, 8L, 1L)))
    assert(out == Seq((1L, Some(10L)), (2L, Some(11L))))
  }

  test("q73/q74 run end-to-end on the fixture and agree on event counts") {
    val asof = TemporalJoins.q73(spark, sfDir)
    val range = TemporalJoins.q74(spark, sfDir)
    val nPurchases = Tables.events(spark, sfDir)
      .where(col("event_type") === "purchase").count()
    val nErrors = Tables.events(spark, sfDir)
      .where(col("event_type") === "error").count()
    assert(asof.count() == nPurchases) // one output row per probe row
    assert(range.count() == nErrors)
    // every matched click really is at-or-before its purchase
    assert(asof.where(col("gap_us") < 0).count() == 0)
  }
}
