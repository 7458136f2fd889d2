package graft

import org.apache.spark.sql.functions._
import graft.operators.Clusters

/** Connected-components / dedup-cluster semantics (q67's machinery). */
class ClustersSpec extends SparkTestBase {
  import spark.implicits._

  private def edges(ps: (Long, Long)*) =
    ps.toDF("id_a", "id_b")

  test("chain collapses to one cluster labeled by its min node") {
    // 1-2, 2-3, 3-4: diameter-3 chain → single component rooted at 1
    val out = Clusters.connectedComponents(edges(1L -> 2L, 2L -> 3L, 3L -> 4L))
      .orderBy("id").as[(Long, Long)].collect()
    assert(out.toSeq == Seq((1L, 1L), (1L, 2L), (1L, 3L), (1L, 4L)))
  }

  test("disjoint cliques stay separate; labels are per-component minima") {
    val out = Clusters.connectedComponents(
        edges(10L -> 11L, 11L -> 12L, 10L -> 12L, 20L -> 21L))
      .orderBy("id").as[(Long, Long)].collect()
    assert(out.toSeq ==
      Seq((10L, 10L), (10L, 11L), (10L, 12L), (20L, 20L), (20L, 21L)))
  }

  test("edge order and direction do not change the labeling") {
    val a = Clusters.connectedComponents(edges(5L -> 3L, 9L -> 5L, 1L -> 9L))
      .orderBy("id").as[(Long, Long)].collect().toSeq
    val b = Clusters.connectedComponents(edges(1L -> 9L, 3L -> 5L, 5L -> 9L))
      .orderBy("id").as[(Long, Long)].collect().toSeq
    assert(a == b)
    assert(a == Seq((1L, 1L), (1L, 3L), (1L, 5L), (1L, 9L)))
  }

  test("dedupClusters keeps exactly the min id per cluster, drops the rest") {
    val out = Clusters.dedupClusters(edges(2L -> 7L, 7L -> 4L, 30L -> 31L))
      .orderBy("id").select("id", "action").as[(Long, String)].collect().toSeq
    assert(out == Seq((2L, "keep"), (4L, "drop"), (7L, "drop"),
      (30L, "keep"), (31L, "drop")))
  }

  test("maxIter too small for the diameter fails loudly, not wrongly") {
    // 6-node path has diameter 5; one round cannot reach the fixpoint
    val path = edges(1L -> 2L, 2L -> 3L, 3L -> 4L, 4L -> 5L, 5L -> 6L)
    val e = intercept[IllegalArgumentException] {
      Clusters.connectedComponents(path, maxIter = 1).collect()
    }
    assert(e.getMessage.contains("converge"))
  }
}
