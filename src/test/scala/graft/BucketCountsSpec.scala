package graft

import scala.util.Random

import org.apache.spark.sql.catalyst.expressions.{Literal, XxHash64}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.BucketCountsExpr
import org.apache.spark.sql.types.{ArrayType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** BucketCountsExpr vs a hand model built on the BUILTIN xxhash64
  * expression (the hash contract the DuckDB oracle replays), interpreted
  * eval vs whole-stage codegen under strictCodegen, and the skip
  * contract for NULL/empty elements. */
class BucketCountsSpec extends SparkTestBase {
  import spark.implicits._

  private val F = 32

  private def builtinBucket(t: String): Int = {
    val h = XxHash64(Seq(Literal(UTF8String.fromString(t), StringType)), 42L)
      .eval(null).asInstanceOf[Long]
    (((h % F) + F) % F).toInt
  }

  private def model(toks: Seq[String]): Seq[Long] = {
    val c = new Array[Long](F)
    toks.filter(_ != null).filter(_.nonEmpty)
      .foreach(t => c(builtinBucket(t)) += 1L)
    c.toSeq
  }

  private def evalKernel(toks: Seq[String]): Seq[Long] = {
    val arr = new GenericArrayData(
      toks.map(t => if (t == null) null else UTF8String.fromString(t)).toArray[Any])
    BucketCountsExpr.compute(arr, F).toLongArray().toSeq
  }

  test("interpreted compute == builtin-xxhash64 model on random token bags") {
    for (seed <- 1 to 10) {
      val rnd = new Random(seed)
      val vocab = Vector("the", "a", "word", "données", "模型", "x", "42",
        "#tag", "NASA", "multi-byte-ü")
      val toks = Seq.fill(1 + rnd.nextInt(60))(vocab(rnd.nextInt(vocab.size)))
      assert(evalKernel(toks) === model(toks), s"seed=$seed")
    }
  }

  test("NULL and empty elements are skipped (the tokens() filter contract)") {
    assert(evalKernel(Seq("a", null, "", "a")) === model(Seq("a", "a")))
    assert(evalKernel(Seq.empty) === Seq.fill(F)(0L))
  }

  test("codegen == interpreted == model through a DataFrame under strictCodegen") {
    val rows = (1 to 6).map { seed =>
      val rnd = new Random(100 + seed)
      val vocab = Vector("alpha", "beta", "the", "of", "γ", "12")
      (seed.toLong, Seq.fill(1 + rnd.nextInt(40))(vocab(rnd.nextInt(vocab.size))))
    }
    val got = strictCodegen {
      rows.toDF("id", "toks")
        .withColumn("cnts", BucketCountsExpr.column(col("toks"), F))
        .orderBy(col("id"))
        .collect()
        .map(r => r.getSeq[Long](2))
    }
    rows.zip(got).foreach { case ((_, toks), c) =>
      assert(c === model(toks))
    }
  }

  test("kernel equals the exploded pmod(xxhash64) count it replaced") {
    val docs = Tables.documents(spark, sfDir).select(col("doc_id"),
      graft.ops.TextQueries.tokens(col("text")).as("toks"))
    val kernel = docs
      .select(col("doc_id"),
        posexplode(BucketCountsExpr.column(col("toks"), F)).as(Seq("j0", "c")))
      .filter(col("c") > 0L)
      .select(col("doc_id"), col("j0").cast("long").as("j"), col("c"))
    val exploded = docs
      .select(col("doc_id"), explode(col("toks")).as("t"))
      .select(col("doc_id"), pmod(xxhash64(col("t")), lit(F.toLong)).as("j"))
      .groupBy(col("doc_id"), col("j")).agg(count(lit(1)).as("c"))
    assert(kernel.exceptAll(exploded).isEmpty && exploded.exceptAll(kernel).isEmpty)
  }
}
