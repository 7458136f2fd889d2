package graft

import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.AdcScoreExpr
import org.apache.spark.sql.types.{ArrayType, IntegerType}

import scala.util.Random

/** AdcScoreExpr (the q98/q158 ADC scorer) against a hand model on random
  * LUTs: codegen (DataFrame) and interpreted (direct eval) paths must
  * agree with Σ_mi lut[qidx·m·k + mi·k + codes(mi)] bit-for-bit, and the
  * malformed-row contract (the IntSqDistExpr convention) must NULL — not
  * garbage-score or throw on — wrong-length codes, NULL elements,
  * out-of-range code values, and out-of-range query indices. */
class AdcScoreSpec extends SparkTestBase {
  import spark.implicits._

  private val M = 8
  private val K = 16
  private val Q = 3 // queries in the LUT batch

  test("codegen == interpreted == hand model on random LUTs/codes") {
    val rnd = new Random(1234L)
    val luts = Array.fill(Q * M * K)(rnd.nextDouble() * 10.0 - 5.0)
    def model(codes: Seq[Int], qidx: Int): Double = {
      var s = 0.0
      codes.indices.foreach(mi => s += luts(qidx * M * K + mi * K + codes(mi)))
      s
    }
    val rows: Seq[(Seq[Int], Int)] =
      Seq.tabulate(60)(i => (Seq.fill(M)(rnd.nextInt(K)), i % Q)) ++
        Seq((Seq.fill(M)(0), 0), (Seq.fill(M)(K - 1), Q - 1)) // LUT corners
    val out = strictCodegen(rows.toDF("codes", "qidx")
      .select(AdcScoreExpr.column(col("codes"), col("qidx"), luts, M, K)
        .as("adc"))
      .collect())
    rows.indices.foreach { i =>
      val exp = model(rows(i)._1, rows(i)._2)
      assert(!out(i).isNullAt(0) && out(i).getDouble(0) == exp,
        s"codegen mismatch at $i")
      val interp = AdcScoreExpr(
        Literal.create(ArrayData.toArrayData(rows(i)._1.toArray),
          ArrayType(IntegerType, false)),
        Literal(rows(i)._2), luts, M, K).eval(null)
      assert(interp == exp, s"interpreted mismatch at $i")
    }
  }

  test("malformed rows NULL in both paths (never a garbage LUT slot)") {
    val luts = Array.tabulate(Q * M * K)(_.toDouble)
    // (codes, qidx, expectNull)
    val rows: Seq[(Seq[Option[Int]], Int, Boolean)] = Seq(
      (Seq.fill(M)(Some(1)), 0, false),                  // control
      (Seq.fill(M - 1)(Some(1)), 0, true),               // short codes
      (Seq.fill(M + 1)(Some(1)), 0, true),               // long codes
      (Some(1) +: Seq.fill(M - 2)(Some(2)) :+ None, 0, true), // NULL element
      (Seq.fill(M)(Some(K)), 0, true),                   // code == k
      (Seq.fill(M)(Some(-1)), 0, true),                  // negative code
      (Seq.fill(M)(Some(1)), Q, true),                   // qidx past the batch
      (Seq.fill(M)(Some(1)), -1, true),                  // negative qidx
      // qidx·m·k wraps int: the wrapped-negative base must not slip
      // past the bound check into an AIOOBE
      (Seq.fill(M)(Some(1)), Int.MaxValue, true))
    val out = strictCodegen(rows.map { case (c, q, _) => (c, q) }
      .toDF("codes", "qidx")
      .select(AdcScoreExpr.column(col("codes"), col("qidx"), luts, M, K)
        .as("adc"))
      .collect())
    rows.indices.foreach { i =>
      assert(out(i).isNullAt(0) == rows(i)._3,
        s"codegen null contract at $i: got ${out(i)}")
      val interp = AdcScoreExpr(
        Literal.create(ArrayData.toArrayData(
          rows(i)._1.map(_.map(Int.box).orNull).toArray[Any]),
          ArrayType(IntegerType, true)),
        Literal(rows(i)._2), luts, M, K).eval(null)
      assert((interp == null) == rows(i)._3, s"interpreted null contract at $i")
    }
    // the control row scores the real slots
    assert(out(0).getDouble(0) ==
      (0 until M).map(mi => luts(mi * K + 1)).sum)
  }
}
