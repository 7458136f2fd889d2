package graft

import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.IntSqDistExpr
import org.apache.spark.sql.types.{ArrayType, LongType}

import scala.util.Random

/** IntSqDistExpr (the q186 brute-leg kernel) must be bit-identical to the
  * interpreted `aggregate(zip_with(a,b,(x,y)=>(x−y)²),0L,_+_)` fold it
  * replaced — including the HOF's null contract on length mismatch — and
  * its codegen and interpreted paths must agree with a hand model. */
class IntSqDistSpec extends SparkTestBase {
  import spark.implicits._

  private def model(a: Seq[Long], b: Seq[Long]): Option[Long] =
    if (a.length != b.length) None
    else Some(a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum)

  test("codegen == interpreted == HOF fold, incl. length-mismatch null") {
    val rnd = new Random(7L)
    val pairs: Seq[(Seq[Long], Seq[Long])] =
      Seq.fill(40)((Seq.fill(64)(rnd.nextLong() % 2000L),
        Seq.fill(64)(rnd.nextLong() % 2000L))) ++
        Seq(
          (Seq.fill(64)(0L), Seq.fill(64)(0L)),           // zero distance
          (Seq(1L, 2L), Seq(1L, 2L, 3L)),                 // mismatch → null
          (Seq.empty[Long], Seq.empty[Long]),             // empty → 0
          // |x−y| ~ 2^32 ⇒ one term ~ 2^63·0.5: longs must carry what
          // doubles would round (the twins' real magnitudes are ≤ 2^22
          // per term; ONE such term keeps the ANSI HOF leg below the
          // BIGINT overflow it would throw on)
          (Seq(Int.MaxValue.toLong / 2), Seq(-(Int.MaxValue.toLong / 2))))
    val df = pairs.toDF("a", "b")
    val out = df.select(
        IntSqDistExpr.column(col("a"), col("b")).as("fused"),
        aggregate(zip_with(col("a"), col("b"), (x, y) => (x - y) * (x - y)),
          lit(0L), (acc, v) => acc + v).as("hof"))
      .collect()
    pairs.indices.foreach { i =>
      val exp = model(pairs(i)._1, pairs(i)._2)
      val fused = if (out(i).isNullAt(0)) None else Some(out(i).getLong(0))
      val hof = if (out(i).isNullAt(1)) None else Some(out(i).getLong(1))
      assert(fused == exp, s"codegen mismatch at $i")
      assert(hof == fused, s"HOF form disagrees at $i")
      // interpreted path (direct eval, no codegen)
      def lit64(v: Seq[Long]) = Literal.create(
        ArrayData.toArrayData(v.toArray), ArrayType(LongType, false))
      val interp = IntSqDistExpr(lit64(pairs(i)._1), lit64(pairs(i)._2))
        .eval(null)
      assert(Option(interp).map(_.asInstanceOf[Long]) == exp,
        s"interpreted mismatch at $i")
    }
  }

  test("NULL element nulls the sum, matching the HOF fold (no silent score)") {
    // zip_with/aggregate: a NULL element makes its (x−y)² NULL, which
    // nulls the whole `_+_` fold. The fused kernel must agree — reading
    // the null slot as 0 would silently score a malformed row.
    val rows: Seq[(Seq[Option[Long]], Seq[Option[Long]])] = Seq(
      (Seq(Some(1L), None, Some(3L)), Seq(Some(1L), Some(2L), Some(3L))),
      (Seq(Some(1L), Some(2L)), Seq(None, Some(2L))),
      (Seq(None), Seq(None)),
      (Seq(Some(4L), Some(5L)), Seq(Some(1L), Some(2L))))       // control: no nulls
    val out = rows.toDF("a", "b").select(
        IntSqDistExpr.column(col("a"), col("b")).as("fused"),
        aggregate(zip_with(col("a"), col("b"), (x, y) => (x - y) * (x - y)),
          lit(0L), (acc, v) => acc + v).as("hof"))
      .collect()
    rows.indices.foreach { i =>
      val fused = if (out(i).isNullAt(0)) None else Some(out(i).getLong(0))
      val hof = if (out(i).isNullAt(1)) None else Some(out(i).getLong(1))
      assert(fused == hof, s"null-element contract mismatch at $i: fused=$fused hof=$hof")
    }
    assert(!out(3).isNullAt(0) && out(3).getLong(0) == 18L)
    // interpreted path on a null-element array
    val withNull = Literal.create(
      ArrayData.toArrayData(Array[Any](1L, null, 3L)), ArrayType(LongType, true))
    val noNull = Literal.create(
      ArrayData.toArrayData(Array[Any](1L, 2L, 3L)), ArrayType(LongType, true))
    assert(IntSqDistExpr(withNull, noNull).eval(null) == null)
    assert(IntSqDistExpr(noNull, noNull).eval(null) == 0L)
  }
}
