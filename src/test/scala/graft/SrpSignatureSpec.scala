package graft

import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.SrpSignatureExpr
import org.apache.spark.sql.types.{ArrayType, DoubleType}

import scala.util.Random

/** SrpSignatureExpr (the q38/q49/q185/q192 banded-signature kernel)
  * against two goldens on random inputs: a hand model, and the
  * compositional per-plane `aggregate(zip_with(...))` dot-product form
  * the fused kernel replaced (the WinnowExprSpec discipline). Codegen
  * (DataFrame) and interpreted (direct eval) must both agree, and the
  * malformed-row contract must NULL wrong-length vectors and NULL
  * elements instead of silently bucketing a truncated projection. */
class SrpSignatureSpec extends SparkTestBase {
  import spark.implicits._

  private val Dim = 16
  private val Bands = 3
  private val RowsPerBand = 5

  private def model(v: Seq[Double], planes: Array[Double]): Seq[Long] = {
    val sigs = new Array[Long](Bands)
    (0 until Bands * RowsPerBand).foreach { p =>
      val d = (0 until Dim).map(i => v(i) * planes(p * Dim + i)).sum
      if (d > 0) sigs(p / RowsPerBand) |= (1L << (p % RowsPerBand))
    }
    sigs.toSeq
  }

  test("codegen == interpreted == hand model == per-plane HOF golden") {
    val rnd = new Random(99L)
    val planes = Array.fill(Bands * RowsPerBand * Dim)(rnd.nextGaussian())
    val vecs: Seq[Seq[Double]] =
      Seq.fill(50)(Seq.fill(Dim)(rnd.nextGaussian())) ++
        Seq(Seq.fill(Dim)(0.0)) // zero vector: every dot is 0, no bit set
    val df = vecs.toDF("v")
    // the compositional golden: one dot-product fold per plane, bits OR'd
    // per band — exactly the column pipeline the fused kernel replaced.
    // NOTE on the d > 0 strict sign: the golden fold sums in the SAME
    // left-to-right element order as the kernel loop, so the doubles are
    // bit-identical, not merely close.
    val goldenSig = array((0 until Bands).map { b =>
      (0 until RowsPerBand).map { r =>
        val p = b * RowsPerBand + r
        val plane = typedlit((0 until Dim).map(i => planes(p * Dim + i)))
        when(aggregate(zip_with(col("v"), plane, (x, y) => x * y),
          lit(0.0), (acc, x) => acc + x) > 0, lit(1L << r)).otherwise(lit(0L))
      }.reduce(_.bitwiseOR(_))
    }: _*)
    val out = strictCodegen(df.select(
        SrpSignatureExpr.column(col("v"), planes, Dim, Bands, RowsPerBand)
          .as("fused"),
        goldenSig.as("golden"))
      .collect())
    vecs.indices.foreach { i =>
      val exp = model(vecs(i), planes)
      assert(out(i).getSeq[Long](0) == exp, s"codegen mismatch at $i")
      assert(out(i).getSeq[Long](1) == exp, s"HOF golden disagrees at $i")
      val interp = SrpSignatureExpr(
        Literal.create(ArrayData.toArrayData(vecs(i).toArray),
          ArrayType(DoubleType, false)),
        planes, Dim, Bands, RowsPerBand).eval(null)
      assert(interp.asInstanceOf[ArrayData].toLongArray().toSeq == exp,
        s"interpreted mismatch at $i")
    }
    assert(out(vecs.length - 1).getSeq[Long](0) == Seq(0L, 0L, 0L))
  }

  test("malformed vectors NULL in both paths (no truncated bucketing)") {
    val planes = Array.fill(Bands * RowsPerBand * Dim)(1.0)
    val rows: Seq[(Seq[Option[Double]], Boolean)] = Seq(
      (Seq.fill(Dim)(Some(1.0)), false),                    // control
      (Seq.fill(Dim - 1)(Some(1.0)), true),                 // short
      (Seq.fill(Dim + 1)(Some(1.0)), true),                 // long
      (None +: Seq.fill(Dim - 1)(Some(1.0)), true),         // NULL element
      (Seq.empty[Option[Double]], true))                    // empty
    val out = strictCodegen(rows.map(_._1).toDF("v")
      .select(SrpSignatureExpr.column(col("v"), planes, Dim, Bands,
        RowsPerBand).as("sig"))
      .collect())
    rows.indices.foreach { i =>
      assert(out(i).isNullAt(0) == rows(i)._2,
        s"codegen null contract at $i")
      val interp = SrpSignatureExpr(
        Literal.create(ArrayData.toArrayData(
          rows(i)._1.map(_.map(Double.box).orNull).toArray[Any]),
          ArrayType(DoubleType, true)),
        planes, Dim, Bands, RowsPerBand).eval(null)
      assert((interp == null) == rows(i)._2, s"interpreted null contract at $i")
    }
    // all-positive control: every plane dot is Dim > 0 → all bits set
    assert(out(0).getSeq[Long](0) == Seq.fill(Bands)((1L << RowsPerBand) - 1))
  }
}
