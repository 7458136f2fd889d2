package graft

import org.apache.spark.storage.StorageLevel
import graft.operators.Dedup

class OperatorCachesSpec extends SparkTestBase {
  import spark.implicits._

  private def docs = Seq(
    (1L, "alpha beta gamma delta"),
    (2L, "alpha beta gamma delta"),
    (3L, "epsilon zeta eta theta"))
    .toDF("doc_id", "text")

  test("release() drops operator-internal persists after materialization") {
    OperatorCaches.release() // clean slate from earlier suites
    val before = spark.sparkContext.getPersistentRDDs.size
    Dedup.jaccardPairs(docs, "text", "doc_id").collect()
    assert(spark.sparkContext.getPersistentRDDs.size > before,
      "jaccardPairs should have persisted its multi-consumer subtrees")
    OperatorCaches.release(blocking = true)
    assert(spark.sparkContext.getPersistentRDDs.size == before)
    assert(OperatorCaches.liveCount == 0)
  }

  test("release() leaves caller-owned caches untouched") {
    val mine = docs.persist(StorageLevel.MEMORY_AND_DISK)
    mine.count()
    val withMine = spark.sparkContext.getPersistentRDDs.size
    Dedup.jaccardPairs(docs, "text", "doc_id").collect()
    OperatorCaches.release(blocking = true)
    // graft's persists are gone, the caller's survives
    assert(spark.sparkContext.getPersistentRDDs.size == withMine)
    assert(mine.storageLevel != StorageLevel.NONE)
    mine.unpersist(blocking = true)
  }
}
