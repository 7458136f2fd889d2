package graft

import org.scalacheck.Gen

/** Property sweeps over the closed-form math behind the selection /
  * dedup-planning family — invariants that must hold for EVERY input,
  * not just the fixture: the S-curve algebra q174/q179 report, and the
  * BPE merge loop's conservation laws (q118/q122's engine side).
  */
class SelectionPropertySpec extends SparkTestBase {

  private def sCurve(s: Double, r: Long, b: Long): Double =
    1.0 - math.pow(1.0 - math.pow(s, r.toDouble), b.toDouble)

  test("S-curve: P(candidate|s) is monotone in s and hits 1/2 exactly at " +
    "the planner's midpoint, for every 64-perm factorization") {
    val factorizations = Seq(1L, 2L, 4L, 8L, 16L, 32L, 64L).map(b => (b, 64L / b))
    val ss = Gen.choose(0.001, 0.998)
    factorizations.foreach { case (b, r) =>
      val s50 = math.pow(1.0 - math.pow(0.5, 1.0 / b), 1.0 / r)
      assert(math.abs(sCurve(s50, r, b) - 0.5) < 1e-9, s"(b=$b,r=$r)")
      (1 to 200).foreach { i =>
        val s = ss.pureApply(Gen.Parameters.default,
          org.scalacheck.rng.Seed(i.toLong))
        assert(sCurve(s, r, b) <= sCurve(math.min(s + 0.001, 0.999), r, b) + 1e-12,
          s"monotonicity broke at s=$s (b=$b,r=$r)")
      }
    }
  }

  test("BPE merge loop conserves characters and never grows piece " +
    "counts, on arbitrary generated vocabularies") {
    val word = Gen.choose(1, 8).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf('a', 'b', 'c')).map(_.mkString))
    (1 to 25).foreach { trial =>
      val words = (0 until 12).map(i => word.pureApply(
        Gen.Parameters.default,
        org.scalacheck.rng.Seed(trial.toLong * 7919 + i))).distinct
      val vocab = words.map(w => (w, (w.length % 3 + 1).toLong))
      val merges = graft.ops.TextQueries.bpeMergeRounds(vocab, rounds = 5)
      assert(merges.map(_._1) === (1 to merges.length))
      merges.foreach { case (_, l, r, n) =>
        assert(l.nonEmpty && r.nonEmpty && n > 0)
      }
      // independent greedy replay: applying the merges to every word must
      // conserve characters exactly and never grow the piece count
      def applyMerge(syms: Vector[String], l: String, r: String)
          : Vector[String] = {
        val out = Vector.newBuilder[String]
        var i = 0
        while (i < syms.length) {
          if (i + 1 < syms.length && syms(i) == l && syms(i + 1) == r) {
            out += (l + r); i += 2
          } else { out += syms(i); i += 1 }
        }
        out.result()
      }
      words.foreach { w =>
        val finalPieces = merges.foldLeft(w.map(_.toString).toVector) {
          case (syms, (_, l, r, _)) =>
            val next = applyMerge(syms, l, r)
            assert(next.length <= syms.length)
            next
        }
        assert(finalPieces.mkString === w, "merge replay lost characters")
        assert(finalPieces.nonEmpty)
      }
    }
  }

  test("bpeMergeRounds on a degenerate vocabulary (all single chars) " +
    "terminates with zero merges instead of looping") {
    val merges = graft.ops.TextQueries.bpeMergeRounds(
      Seq(("a", 5L), ("b", 3L), ("c", 1L)), rounds = 10)
    assert(merges.isEmpty)
  }
}
