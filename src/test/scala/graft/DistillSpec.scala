package graft

import java.nio.file.Files
import java.util.regex.Pattern

import scala.util.Random

import org.apache.spark.sql.catalyst.expressions.XxHash64Function
import org.apache.spark.sql.types.StringType
import org.apache.spark.unsafe.types.UTF8String

import graft.ops.Distill

/** Straight-line Scala model of the WHOLE Distill training contract
  * (tokenize → hash-bucket → featurize → label → 4 integer GD steps),
  * checked against the distributed implementation on the fixture corpus
  * and on seeded random corpora (the ModelCheckSpec discipline). The
  * model shares only `XxHash64Function` (the hash itself is pinned by
  * tools/xxh64_ref.py and the q35 oracle); every other step — regex
  * counts, per-mille floors, violation jumps, margins, truncating
  * divisions, updates — is independent driver-side arithmetic.
  */
class DistillSpec extends SparkTestBase {
  import spark.implicits._

  private val F = Distill.HashBuckets
  private val NF = Distill.NumFeatures

  private def countOf(p: Pattern, s: String): Long = {
    val m = p.matcher(s); var c = 0L
    while (m.find()) c += 1
    c
  }
  private val pTok = Pattern.compile("[^\\t\\n\\f\\r ]+")
  private val pNs = Pattern.compile("[^\\t\\n\\f\\r ]")
  private val pSym = Pattern.compile("[#@%^*_~|]")
  private val pDig = Pattern.compile("[0-9]")
  private val pCaps = Pattern.compile("\\b[A-Z]{2,}\\b")
  private val pStop = Pattern.compile("\\b(the|a|of|and|to|in)\\b")

  /** (doc_id, source) → (y, sparse feature map). */
  private def modelFeatures(docs: Seq[(Long, String, String, Long)])
      : Seq[(Long, String, Long, Map[Long, Long])] =
    docs.map { case (id, source, text, nChars) =>
      val toks = {
        val m = pTok.matcher(text)
        val b = Seq.newBuilder[String]
        while (m.find()) b += m.group()
        b.result()
      }
      val nWords = toks.size.toLong
      val nNs = countOf(pNs, text)
      val nSym = countOf(pSym, text); val nDig = countOf(pDig, text)
      val nCaps = countOf(pCaps, text); val nStop = countOf(pStop, text)
      val mwl = nNs * 100L / math.max(nWords, 1L)
      val y = if (nWords >= 50 && nWords <= 100000 &&
        mwl >= 300 && mwl <= 1000 && nSym * 10 <= nWords &&
        nDig * 5 <= nChars && nCaps * 10 <= nWords && nStop >= 2) 1L else 0L
      var f = Map.empty[Long, Long]
      toks.foreach { t =>
        val h = XxHash64Function.hash(UTF8String.fromString(t), StringType, 42L)
        val j = ((h % F) + F) % F
        f = f.updated(j, f.getOrElse(j, 0L) + 1L)
      }
      f = f.map { case (j, c) => j -> c * 1000L / math.max(nWords, 1L) }
      val mags = Seq(
        math.max(50L - nWords, 0L) + math.max(nWords - 100000L, 0L),
        math.max(300L - mwl, 0L) + math.max(mwl - 1000L, 0L),
        math.max(nSym * 10L - nWords, 0L),
        math.max(nDig * 5L - nChars, 0L),
        math.max(nCaps * 10L - nWords, 0L),
        math.max(2L - nStop, 0L) * 500L)
      mags.zipWithIndex.foreach { case (mg, i) =>
        f = f.updated((F + i).toLong, if (mg > 0) 500L + math.min(mg, 500L) else 0L)
      }
      f = f.updated((NF - 1).toLong, 1000L)
      (id, source, y, f)
    }

  private def modelWeights(feats: Seq[(Long, String, Long, Map[Long, Long])])
      : IndexedSeq[Long] = {
    val tr = feats.sortBy(_._1).take(Distill.TrainCap)
    val n = math.max(tr.size.toLong, 1L)
    var w = IndexedSeq.fill(NF)(0L)
    for (_ <- 0 until Distill.Iters) {
      val g = Array.fill(NF)(0L)
      tr.foreach { case (_, _, y, f) =>
        val num = f.iterator.map { case (j, x) => w(j.toInt) * x }.sum
        val p = math.max(0L, math.min(1000L, 500L + num / 4000L))
        val e = p - 1000L * y
        f.foreach { case (j, x) => g(j.toInt) += e * x }
      }
      w = w.indices.map(j => w(j) - g(j) / (n * Distill.LrDen))
    }
    w
  }

  private def loadDocs(dir: String): Seq[(Long, String, String, Long)] =
    Tables.documents(spark, dir)
      .select("doc_id", "source", "text", "n_chars").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
      .toSeq

  test("trainWeights == straight-line model on the fixture corpus") {
    val model = modelWeights(modelFeatures(loadDocs(sfDir)))
    val got = Distill.trainWeights(spark, sfDir)
    OperatorCaches.release()
    assert(got === model)
    assert(got.size === NF)
    // the distillation actually learned: rule-violation features push
    // toward drop, bias toward keep (on the fixture both classes exist)
    assert(got(NF - 1) > 0L, "bias should be positive")
    assert((F until NF - 1).map(got).forall(_ <= 0L),
      "violation weights should be non-positive")
  }

  /** Random corpora: stopword-bearing vocab, lengths straddling the
    * 50-word rule so both labels occur; symbols/digits/caps sprinkled so
    * several rules fire. */
  private def corpus(seed: Int, n: Int): Seq[(Long, String, String, Long)] = {
    val rnd = new Random(seed)
    val vocab = Vector("the", "of", "and", "to", "in", "word", "data",
      "model", "train", "corpus", "alpha", "beta", "gamma", "delta",
      "NASA", "HTTP", "42", "3.14", "#tag", "a@b", "%50", "x_y", "~ok")
    (0L until n).map { i =>
      val len = 5 + rnd.nextInt(110)
      val text = Seq.fill(len)(vocab(rnd.nextInt(vocab.size))).mkString(" ")
      (i, s"src${rnd.nextInt(3)}", text, text.length.toLong)
    }
  }

  test("trainWeights and q197 == model on seeded random corpora; " +
    "the disagreement path is non-vacuous") {
    var totalDisagreements = 0
    for (seed <- 1 to 6) {
      val docs = corpus(seed, 120)
      val dir = Files.createTempDirectory(s"distill_mc$seed").toString
      docs.toDF("doc_id", "source", "text", "n_chars")
        .select($"doc_id", $"text", org.apache.spark.sql.functions.lit("en").as("lang"),
          $"source", $"n_chars")
        .write.mode("overwrite").parquet(s"$dir/documents.parquet")
      val feats = modelFeatures(docs)
      val model = modelWeights(feats)
      val got = Distill.trainWeights(spark, dir)
      assert(got === model, s"seed=$seed")
      // q197 on corpora where the linear model does NOT perfectly recover
      // the rule (the fixture corpus reaches full agreement, so its
      // disagreement set is empty — this loop is where the path is real)
      val expected = feats.flatMap { case (id, src, y, f) =>
        val num = f.iterator.map { case (j, x) => model(j.toInt) * x }.sum
        if ((num >= 0L) != (y == 1L)) Some((id, src, y, num)) else None
      }.sortBy { case (id, _, _, num) => (-math.abs(num), id) }.take(50)
      val gotDis = Distill.q197(spark, dir).collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3))).toSeq
      OperatorCaches.release()
      assert(gotDis === expected, s"seed=$seed")
      totalDisagreements += expected.size
    }
    assert(totalDisagreements > 0,
      "every seed reached full agreement — the q197 check never saw a disagreement")
  }

  test("q195 confusion == model scoring of the full corpus") {
    val docs = loadDocs(sfDir)
    val feats = modelFeatures(docs)
    val w = modelWeights(feats)
    val expected = feats.groupBy(_._2).map { case (src, rows) =>
      val preds = rows.map { case (_, _, y, f) =>
        val num = f.iterator.map { case (j, x) => w(j.toInt) * x }.sum
        (y, num >= 0L)
      }
      (src, preds.size.toLong,
        preds.count(_._2).toLong,
        preds.count(_._1 == 1L).toLong,
        preds.count(p => p._2 == (p._1 == 1L)).toLong)
    }.toSeq.sortBy(_._1)
    val got = Distill.q195(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toSeq
    OperatorCaches.release()
    assert(got === expected)
    assert(got.map(_._2).sum === docs.size.toLong)
  }

  test("q194 emits one row per feature, ordered") {
    val rows = Distill.q194(spark, sfDir).collect()
    OperatorCaches.release()
    assert(rows.map(_.getLong(0)).toSeq === (0L until NF.toLong))
  }

  test("q196 calibration == model; bins partition the corpus") {
    val docs = loadDocs(sfDir)
    val feats = modelFeatures(docs)
    val w = modelWeights(feats)
    val expected = feats.map { case (_, _, y, f) =>
      val num = f.iterator.map { case (j, x) => w(j.toInt) * x }.sum
      (y, math.max(0L, math.min(1000L, 500L + num / 4000L)))
    }.groupBy(_._2 / 100L).map { case (bin, rows) =>
      (bin, rows.size.toLong, rows.count(_._1 == 1L).toLong, rows.map(_._2).sum)
    }.toSeq.sortBy(_._1)
    val got = Distill.q196(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    OperatorCaches.release()
    assert(got === expected)
    assert(got.map(_._2).sum === docs.size.toLong, "bins must partition")
  }

  test("q197 disagreements == model top-50 by |margin|") {
    val docs = loadDocs(sfDir)
    val feats = modelFeatures(docs)
    val w = modelWeights(feats)
    val expected = feats.flatMap { case (id, src, y, f) =>
      val num = f.iterator.map { case (j, x) => w(j.toInt) * x }.sum
      if ((num >= 0L) != (y == 1L)) Some((id, src, y, num)) else None
    }.sortBy { case (id, _, _, num) => (-math.abs(num), id) }.take(50)
    val got = Distill.q197(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3))).toSeq
    OperatorCaches.release()
    assert(got === expected)
  }

  test("q198 threshold sweep == model; keep rate monotone non-increasing in tau") {
    val docs = loadDocs(sfDir)
    val feats = modelFeatures(docs)
    val w = modelWeights(feats)
    val nums = feats.map { case (_, _, y, f) =>
      (y, f.iterator.map { case (j, x) => w(j.toInt) * x }.sum)
    }
    val expected = Seq(-8000L, -4000L, 0L, 4000L, 8000L).map { tau =>
      (tau, nums.size.toLong,
        nums.count(_._2 >= tau).toLong,
        nums.count(p => (p._2 >= tau) == (p._1 == 1L)).toLong)
    }
    val got = Distill.q198(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    OperatorCaches.release()
    assert(got === expected)
    assert(got.map(_._3) === got.map(_._3).sorted.reverse,
      "keep count must not increase with tau")
  }

  test("q199 persisted-artifact scan == q194 trained vector (write → " +
    "scan loses nothing)") {
    val a = Distill.q194(spark, sfDir).collect().map(r => (r.getLong(0), r.getLong(1)))
    val b = Distill.q199(spark, sfDir).collect().map(r => (r.getLong(0), r.getLong(1)))
    OperatorCaches.release()
    assert(a.toSeq === b.toSeq)
  }

  test("q200 incremental-featurization maintenance == full retrain") {
    val full = Distill.q194(spark, sfDir).collect().map(r => (r.getLong(0), r.getLong(1)))
    val inc = Distill.q200(spark, sfDir).collect().map(r => (r.getLong(0), r.getLong(1)))
    OperatorCaches.release()
    assert(inc.toSeq === full.toSeq)
  }

  test("stream gate: checkpointed restart scores each doc exactly once " +
    "and matches the batch scoring") {
    import org.apache.spark.sql.functions.col
    import org.apache.spark.sql.streaming.Trigger
    val root = Files.createTempDirectory("graft-gate-eo")
    val (in, out, ck) = (s"$root/in", s"$root/out", s"$root/ck")
    val w = Distill.trainWeights(spark, sfDir)
    val docs = Tables.documents(spark, sfDir)

    def runOnce(): Unit = {
      val q = Distill.scoredFrom(
          spark.readStream
            .schema("doc_id LONG, text STRING, lang STRING, source STRING, n_chars LONG")
            .parquet(in), w)
        .writeStream.format("parquet")
        .option("checkpointLocation", ck).option("path", out)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination(120000)
    }

    docs.filter(col("doc_id") % 2 === 0).write.mode("append").parquet(in)
    runOnce()
    docs.filter(col("doc_id") % 2 =!= 0).write.mode("append").parquet(in)
    runOnce() // restart from the checkpoint: committed files must not rescore

    val got = spark.read.parquet(out)
      .select("doc_id", "y", "num").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    val batch = Distill.scoredFrom(docs, w)
      .select("doc_id", "y", "num").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    OperatorCaches.release()
    assert(got.map(_._1).distinct.length === got.length, "a doc scored twice")
    assert(got.toSeq === batch.toSeq)
  }
}
