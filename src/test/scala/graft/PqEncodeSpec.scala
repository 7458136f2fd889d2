package graft

import scala.util.Random

import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.PqEncodeExpr
import org.apache.spark.sql.types.{ArrayType, DoubleType}

/** PqEncodeExpr contract: codegen (DataFrame path) ≡ interpreted
  * (direct eval) ≡ a straight-line Scala model, across random vectors,
  * short/zero vectors, and tie-heavy codebooks. */
class PqEncodeSpec extends SparkTestBase {
  import spark.implicits._

  private val dim = 16
  private val m = 4
  private val k = 5
  private val sub = dim / m

  private def model(v: Array[Double], books: Array[Array[Array[Double]]]): Seq[Int] = {
    var nsq = 0.0
    v.foreach(x => nsq += x * x)
    val scale = if (nsq == 0.0) 1.0 else 1.0 / math.sqrt(nsq)
    (0 until m).map { mi =>
      val dists = (0 until k).map { c =>
        (0 until sub).map { i =>
          val idx = mi * sub + i
          val x = if (idx < v.length) v(idx) * scale else 0.0
          val t = x - books(mi)(c)(i); t * t
        }.sum
      }
      dists.indexOf(dists.min) // first minimum = lowest centroid index
    }
  }

  test("codegen == interpreted == model on random, short, zero, tied inputs") {
    val rnd = new Random(7L)
    val books = Array.fill(m, k, sub)(rnd.nextDouble() * 2 - 1)
    // duplicate centroid 3 of every subspace as centroid 4 → forced ties
    for (mi <- 0 until m) books(mi)(4) = books(mi)(3).clone()
    val vecs: Seq[Array[Double]] =
      Seq.fill(30)(Array.fill(dim)(rnd.nextDouble() * 4 - 2)) ++
        Seq(Array.fill(dim)(0.0),            // zero vector
          Array.fill(sub + 1)(1.0),          // shorter than dim
          Array.fill(dim + 3)(0.5))          // longer than dim
    // codegen path (whole-stage over a real plan)
    val df = vecs.map(v => Tuple1(v.toSeq)).toDF("v")
    val got = df.select(PqEncodeExpr.column(col("v"), books).as("codes"))
      .collect().map(_.getSeq[Int](0))
    // interpreted path (direct eval of the expression)
    val interp = vecs.map { v =>
      val lit = Literal.create(ArrayData.toArrayData(v),
        ArrayType(DoubleType, containsNull = false))
      PqEncodeExpr(lit, books.flatMap(_.flatten), m, k, sub)
        .eval(null).asInstanceOf[ArrayData].toIntArray().toSeq
    }
    vecs.indices.foreach { i =>
      val exp = model(vecs(i), books)
      assert(got(i) == exp, s"codegen mismatch at $i")
      assert(interp(i) == exp, s"interpreted mismatch at $i")
      // ties resolved to the lowest index: duplicate centroid 4 never wins
      assert(got(i).forall(_ != 4), s"tie not lowest-index at $i")
    }
  }
}
