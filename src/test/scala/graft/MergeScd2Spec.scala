package graft

import org.apache.spark.sql.functions._

import graft.operators.Dedup
import graft.ops.Merge

/** Invariants for the round-5 additions: SCD2 history reconstruction and
  * incremental near-dup vs the self-join LSH family. */
class MergeScd2Spec extends SparkTestBase {
  import spark.implicits._

  test("scd2History: ranges tile each key's timeline, current == last value") {
    val changes = Seq(
      // key 1: a→a→b→a  ⇒ runs a, b, a (consecutive dup collapsed)
      (1L, "a", 10L, 1L), (1L, "a", 20L, 2L), (1L, "b", 30L, 3L),
      (1L, "a", 40L, 4L),
      // key 2: single value, always current
      (2L, "x", 15L, 5L))
      .toDF("k", "v", "ts", "id")
    val got = Merge.scd2History(changes, "k", "v", "ts", "id")
      .orderBy("k", "valid_from")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        Option(r.get(3)).map(_.asInstanceOf[Long]), r.getBoolean(4)))
    assert(got.toSeq == Seq(
      (1L, "a", 10L, Some(30L), false),
      (1L, "b", 30L, Some(40L), false),
      (1L, "a", 40L, None, true),
      (2L, "x", 15L, None, true)))
    // each key's ranges tile: valid_to(i) == valid_from(i+1), one current
    got.groupBy(_._1).foreach { case (_, rows) =>
      rows.sliding(2).foreach {
        case Array(a, b) => assert(a._4.contains(b._3))
        case _ =>
      }
      assert(rows.count(_._5) == 1)
      assert(rows.last._4.isEmpty)
    }
  }

  test("scd2History on fixture events: current rows == last event_type per user") {
    val e = Tables.events(spark, sfDir).where(col("user_id") < 50)
      .select(col("user_id"), col("event_type"), col("ts"), col("event_id"))
    val current = Merge.scd2History(e, "user_id", "event_type", "ts", "event_id")
      .where(col("is_current"))
      .select(col("user_id"), col("event_type"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toMap
    val last = e.withColumn("_rk",
        row_number().over(org.apache.spark.sql.expressions.Window
          .partitionBy(col("user_id"))
          .orderBy(col("ts").desc, col("event_id").desc)))
      .where(col("_rk") === 1)
      .collect().map(r => (r.getLong(0), r.getString(1))).toMap
    assert(current == last)
    assert(current.nonEmpty)
  }

  test("incrementalNearDup (production xxhash) == cross-side slice of minhashCandidates") {
    val d = Tables.documents(spark, sfDir)
    val split = 40L
    val inc = Dedup.incrementalNearDup(
        d.filter(col("doc_id") < split), d.filter(col("doc_id") >= split),
        "text", "doc_id")
      .collect()
      .map(r => (r.getLong(1), r.getLong(0), r.getDouble(2))).toSet
    OperatorCaches.release()
    val all = Dedup.minhashCandidates(d, "text", "doc_id")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .filter { case (a, b, _) => a < split && b >= split }
      .toSet
    OperatorCaches.release()
    assert(inc == all, s"inc=${inc.size} selfJoinSlice=${all.size}")
    assert(inc.nonEmpty)
  }

  test("incrementalNearDupSha == cross-side slice of the self-join candidates") {
    val d = Tables.documents(spark, sfDir)
    val split = 40L
    val inc = Dedup.incrementalNearDupSha(
        d.filter(col("doc_id") < split), d.filter(col("doc_id") >= split),
        "text", "doc_id")
      .collect()
      .map(r => (r.getLong(1), r.getLong(0), r.getDouble(2))).toSet
    OperatorCaches.release()
    // self-join over the union, restricted to (history, batch) pairs
    val all = Dedup.minhashShaCandidates(d, "text", "doc_id")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .filter { case (a, b, _) => a < split && b >= split }
      .toSet
    OperatorCaches.release()
    assert(inc == all, s"inc=${inc.size} selfJoinSlice=${all.size}")
    assert(inc.nonEmpty)
  }
}
