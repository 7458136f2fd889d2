package graft

import scala.util.Random

import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.IntCodesExpr
import org.apache.spark.sql.types.{ArrayType, LongType}

/** IntCodesExpr contract: codegen (DataFrame path) ≡ interpreted
  * (direct eval) ≡ a straight-line Scala model, over random integer
  * vectors, short/zero vectors, tie-heavy codebooks, and values large
  * enough that a double-precision accumulator would diverge — the twins
  * (q183/q184) depend on the distances staying exact BIGINTs. */
class IntCodesSpec extends SparkTestBase {
  import spark.implicits._

  private val dim = 16
  private val m = 4
  private val k = 5
  private val sub = dim / m

  private def model(v: Array[Long], books: IndexedSeq[IndexedSeq[IndexedSeq[Long]]]): Seq[Int] =
    (0 until m).map { mi =>
      val dists = (0 until k).map { c =>
        (0 until sub).map { i =>
          val idx = mi * sub + i
          val x = if (idx < v.length) v(idx) else 0L
          val t = x - books(mi)(c)(i); t * t
        }.sum
      }
      dists.indexOf(dists.min) // first minimum = lowest centroid index
    }

  test("codegen == interpreted == model; ties to lowest cid; exact at 2^31-scale values") {
    val rnd = new Random(11L)
    val books: IndexedSeq[IndexedSeq[IndexedSeq[Long]]] =
      IndexedSeq.fill(m, k, sub)(rnd.nextLong() % 2000L)
        // duplicate centroid 3 of every subspace as centroid 4 → forced ties
        .map(b => b.updated(4, b(3)))
    val vecs: Seq[Array[Long]] =
      Seq.fill(30)(Array.fill(dim)(rnd.nextLong() % 2000L)) ++
        Seq(Array.fill(dim)(0L),            // zero vector
          Array.fill(sub + 1)(1L),          // shorter than dim
          Array.fill(dim + 3)(7L),          // longer than dim
          // |x−c| ~ 2^31 ⇒ squared terms ~ 2^62: doubles would round,
          // longs must not overflow for sub=4 such terms (they don't:
          // the twins quantize by ×1000 so real magnitudes are ≤ 2^21)
          Array.fill(dim)(Int.MaxValue.toLong / 2))
    // codegen path (whole-stage over a real plan)
    val df = vecs.map(v => Tuple1(v.toSeq)).toDF("v")
    val got = df.select(IntCodesExpr.column(col("v"), books).as("codes"))
      .collect().map(_.getSeq[Int](0))
    // interpreted path (direct eval of the expression)
    val interp = vecs.map { v =>
      val lit = Literal.create(ArrayData.toArrayData(v),
        ArrayType(LongType, containsNull = false))
      IntCodesExpr(lit, books.flatten.flatten, m, k, sub)
        .eval(null).asInstanceOf[ArrayData].toIntArray().toSeq
    }
    vecs.indices.foreach { i =>
      val exp = model(vecs(i), books)
      assert(got(i) == exp, s"codegen mismatch at $i")
      assert(interp(i) == exp, s"interpreted mismatch at $i")
      assert(got(i).forall(_ != 4), s"tie not lowest-index at $i")
    }
  }

  test("argmin helper: single-codebook assignment matches the struct-sort form") {
    val rnd = new Random(13L)
    val cents: IndexedSeq[IndexedSeq[Long]] =
      IndexedSeq.fill(6, dim)(rnd.nextLong() % 1000L)
    val vecs = Seq.fill(40)(Array.fill(dim)(rnd.nextLong() % 1000L))
    val df = vecs.map(v => Tuple1(v.toSeq)).toDF("qv")
    // the interpreted struct-sort form IntCodesExpr.argmin replaced
    val structForm = array_sort(array(cents.zipWithIndex.map { case (cv, i) =>
      struct(
        aggregate(zip_with(col("qv"), typedlit(cv), (x, c) => (x - c) * (x - c)),
          lit(0L), (a, v) => a + v).as("d"),
        lit(i).as("c"))
    }: _*)).getItem(0).getField("c")
    val rows = df.select(IntCodesExpr.argmin(col("qv"), cents).as("fused"),
      structForm.as("legacy")).collect()
    rows.foreach(r => assert(r.getInt(0) == r.getInt(1)))
  }
}
