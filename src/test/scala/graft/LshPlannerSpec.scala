package graft

import graft.ops.LshPlanner

/** q174 — the S-curve banding planner over the 64-perm budget. */
class LshPlannerSpec extends SparkTestBase {

  private val factorizations =
    Seq(1, 2, 4, 8, 16, 32, 64).map(b => (b.toLong, 64L / b))

  test("q174: every recommendation uses the full 64-perm budget and is " +
    "the argmin-distance factorization (scala recomputation)") {
    val rows = LshPlanner.q174(spark, sfDir).collect()
    assert(rows.map(_.getDouble(0)).toSeq === Seq(0.5, 0.6, 0.7, 0.8, 0.9))
    rows.foreach { r =>
      val tau = r.getDouble(0); val b = r.getLong(1); val rr = r.getLong(2)
      assert(b * rr === 64L)
      val best = factorizations.minBy { case (bb, rb) =>
        val s50 = math.pow(1.0 - math.pow(0.5, 1.0 / bb), 1.0 / rb)
        (math.round(math.abs(s50 - tau) * 1e7), rb, bb)
      }
      assert((b, rr) === best, s"tau=$tau")
    }
  }

  test("q174: operating probabilities are coherent — catch rate at tau " +
    "between the FP floor and the near-certain band above") {
    LshPlanner.q174(spark, sfDir).collect().foreach { r =>
      val pTau = r.getDouble(4); val pFp = r.getDouble(5)
      val pMiss = r.getDouble(6)
      assert(pTau >= 0.0 && pTau <= 1.0)
      assert(pFp <= pTau + 1e-9) // collision prob is monotone in s
      assert(1.0 - pMiss >= pTau - 1e-9)
      // the midpoint criterion keeps tau near the S-curve's active zone
      assert(pTau > 0.05 && pTau < 0.999)
    }
  }
}
