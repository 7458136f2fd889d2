package graft

import org.apache.spark.sql.functions._
import graft.operators.Dedup

/** Throwaway profiling harness — not committed. */
class ScratchTimingSpec extends SparkTestBase {
  test("time q34 phases at sf0.1") {
    val dir = "/root/testdata/sf0.1"
    def t[A](name: String)(f: => A): A = {
      val s = System.nanoTime(); val r = f
      println(f"[scratch] $name%-22s ${(System.nanoTime() - s) / 1e9}%.2f s"); r
    }
    val docs = Tables.documents(spark, dir).filter(col("doc_id") < 100)
    t("warmup count")(docs.count())
    t("sigs.count")(Dedup.minhashSignatures(docs, "text", "doc_id").count())
    t("sigs.count again")(Dedup.minhashSignatures(docs, "text", "doc_id").count())
    t("cands.count")(Dedup.minhashCandidates(docs, "text", "doc_id").count())
    graft.OperatorCaches.release()
    t("cands.count again")(Dedup.minhashCandidates(docs, "text", "doc_id").count())
    graft.OperatorCaches.release()
    t("q34 full")(Dedup.q34(spark, dir).collect().length)
    graft.OperatorCaches.release()
  }
}
