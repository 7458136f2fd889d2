package graft

import org.apache.spark.sql.functions._
import graft.streaming.VectorStream

/** q175 — the stateless streaming embedding decontamination gate. */
class VectorStreamSpec extends SparkTestBase {

  test("q175: streaming gate ≡ batch screen (same rows, same verdicts, " +
    "whatever micro-batching AvailableNow picked)") {
    val streamed = VectorStream.q175(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2)))
    val batch = VectorStream.screen(
        Tables.embeddings(spark, sfDir).select("vec_id", "embedding"),
        VectorStream.evalSet(spark, sfDir))
      .orderBy(col("vec_id"))
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2)))
    assert(streamed.toSeq === batch.toSeq)
  }

  test("q175: every vector passes the gate exactly once and every eval " +
    "member self-quarantines at cosine 1.0") {
    val out = VectorStream.q175(spark, sfDir).collect()
    assert(out.length === Tables.embeddings(spark, sfDir).count())
    assert(out.map(_.getLong(0)).distinct.length === out.length)
    val evalIds = Tables.embeddings(spark, sfDir)
      .where(col("vec_id") % 50 === 0)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    out.filter(r => evalIds(r.getLong(0))).foreach { r =>
      assert(r.getDouble(1) === 1.0)
      assert(r.getLong(2) === 1L)
    }
    // the gate is a screen, not a rubber stamp: non-eval vectors exist
    // and carry honest sub-quarantine cosines on this fixture
    val clean = out.filter(r => !evalIds(r.getLong(0)))
    assert(clean.nonEmpty)
    assert(clean.forall(r => r.getDouble(1) < 1.0))
  }
}
