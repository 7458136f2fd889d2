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

  test("star contraction: a 2000-link chain converges within the default rounds") {
    // Chunk-overlap corpora build CHAINS (A~B~C~…) whose diameter far
    // exceeds any reasonable round budget; plain min-label propagation
    // moves the root one hop per round (2000 rounds here — impossible at
    // any bounded budget), while large-star/small-star contraction
    // reaches every node in O(log n) rounds.
    val n = 2000
    val chain = spark.range(n - 1)
      .select(col("id").as("id_a"), (col("id") + 1).as("id_b"))
    val out = Clusters.connectedComponents(chain)
      .agg(countDistinct(col("cluster")), count(lit(1)), max(col("cluster")))
      .collect()(0)
    assert(out.getLong(0) == 1L, "one component")
    assert(out.getLong(1) == n.toLong, "every node labeled")
    assert(out.getLong(2) == 0L, "label is the chain min")
  }

  test("star contraction preserves labels on long-cycle structured graphs") {
    // 300 nodes, arithmetic-progression edges that form LONG CYCLES — the
    // regime where one-hop label propagation (even with a single pointer
    // jump per round, measured ~2 hops/round) cannot converge in a
    // bounded budget. Reference labeling via a driver-side union-find.
    val ps = (0 until 600).map { k =>
      val a = (k * 7919L) % 300
      val b = (k * 104729L + 13) % 300
      (math.min(a, b), math.max(a, b))
    }.filter(p => p._1 != p._2).distinct
    val parent = Array.tabulate(300)(identity)
    def find(x: Int): Int = { var r = x; while (parent(r) != r) r = parent(r); r }
    ps.foreach { case (a, b) =>
      val (ra, rb) = (find(a.toInt), find(b.toInt))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val want = ps.flatMap(p => Seq(p._1, p._2)).distinct.sorted
      .map(id => (id, find(id.toInt).toLong))
    val got = Clusters.connectedComponents(edges(ps: _*))
      .orderBy("id").select("id", "cluster").as[(Long, Long)].collect()
      .map(r => (r._1, r._2)).toSeq
    assert(got == want.map(p => (p._1, p._2)))
  }
}
