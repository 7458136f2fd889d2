package graft

import graft.operators.DedupAudit

/** q179 — the LSH operating-point audit (measurement twin of q174). */
class DedupAuditSpec extends SparkTestBase {

  test("q179: counts are a coherent confusion summary at every " +
    "threshold, and the candidate set does not depend on tau") {
    val rows = DedupAudit.q179(spark, sfDir).collect()
    assert(rows.map(_.getDouble(0)).toSeq === Seq(0.3, 0.5, 0.7))
    val cands = rows.map(_.getLong(2)).distinct
    assert(cands.length === 1) // banding never sees tau
    var prevTruth = Long.MaxValue
    rows.foreach { r =>
      val (truth, cand, tp) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(tp <= truth && tp <= cand)
      assert(truth <= prevTruth) // truth shrinks as tau rises
      prevTruth = truth
      if (cand > 0) assert(r.getDouble(4) === tp.toDouble / cand)
      if (truth > 0) assert(r.getDouble(5) === tp.toDouble / truth)
      val pred = r.getDouble(6)
      assert(pred >= 0.0 && pred <= 1.0)
    }
  }

  test("q179: on the fixture the banding catches the true near-dup " +
    "pairs (recall 1.0 at tau=0.5) with high precision — and the audit " +
    "runs on unique texts (clone pairs never inflate the sets)") {
    val rows = DedupAudit.q179(spark, sfDir).collect()
    val at05 = rows.find(_.getDouble(0) == 0.5).get
    assert(at05.getDouble(5) === 1.0, "recall@0.5")
    assert(at05.getDouble(4) > 0.9, "precision")
    // unique-text discipline: candidate count is far below the clone-pair
    // count a member-expanded audit would produce (500 docs with heavy
    // clone groups → thousands of member pairs)
    assert(at05.getLong(2) < 100)
  }

  test("q181: the maintained band index covers every doc with exactly " +
    "4 well-formed band rows (history artifact + batch delta partition " +
    "the corpus)") {
    val idx = DedupAudit.q181(spark, sfDir).collect()
    val docs = Tables.documents(spark, sfDir).count()
    assert(idx.length === docs * 4)
    val byDoc = idx.groupBy(_.getLong(0))
    assert(byDoc.size.toLong === docs)
    byDoc.values.foreach { rows =>
      assert(rows.map(_.getInt(1)).sorted.toSeq === Seq(0, 1, 2, 3))
    }
    idx.foreach { r =>
      val bh = r.getString(2)
      assert(bh.length === 17 && bh(8) === '|', bh)
    }
  }
}
