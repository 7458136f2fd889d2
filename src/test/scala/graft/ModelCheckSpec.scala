package graft

import scala.util.Random

import org.apache.spark.sql.functions.col
import graft.operators.{Dedup, Pack}

/** Model-based randomized checks: run the distributed operator against a
  * straight-line Scala model of its contract over seeded random corpora
  * (small vocabulary → dup-heavy, the regime that matters). Seeds are
  * fixed, so failures reproduce exactly.
  */
class ModelCheckSpec extends SparkTestBase {
  import spark.implicits._

  /** Dup-heavy random corpus: ~40% of texts are repeats. */
  private def corpus(seed: Long, n: Int): Seq[(Long, String, String)] = {
    val rnd = new Random(seed)
    val vocab = Vector("alpha", "beta", "gamma", "delta", "eps", "zeta")
    def freshText() =
      Seq.fill(1 + rnd.nextInt(12))(vocab(rnd.nextInt(vocab.size))).mkString(" ")
    val texts = scala.collection.mutable.ArrayBuffer.empty[String]
    (0L until n).map { i =>
      val t =
        if (texts.nonEmpty && rnd.nextDouble() < 0.4) texts(rnd.nextInt(texts.size))
        else { val t = freshText(); texts += t; t }
      (i, s"src${rnd.nextInt(3)}", t)
    }
  }

  test("scd2History == run-length model on random change streams") {
    for (seed <- 1 to 6) {
      val rnd = new Random(seed)
      val vals = Vector("a", "b", "c")
      // random change stream: ~repeat-heavy values, distinct ts per key
      val rows = (0 until 80).map { i =>
        (rnd.nextInt(5).toLong, vals(rnd.nextInt(vals.size)),
          (10 + rnd.nextInt(500)).toLong, i.toLong)
      }
      val got = graft.ops.Merge
        .scd2History(rows.toDF("k", "v", "ts", "id"), "k", "v", "ts", "id")
        .collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2),
          Option(r.get(3)).map(_.asInstanceOf[Long]), r.getBoolean(4)))
        .sortBy(x => (x._1, x._3, x._4.getOrElse(Long.MaxValue)))
      // model: per key, sort by (ts, id), collapse consecutive equal
      // values, then range each run to the next run's start
      val model = rows.groupBy(_._1).toSeq.flatMap { case (k, rs) =>
        val ordered = rs.sortBy(r => (r._3, r._4))
        val runs = ordered.foldLeft(Vector.empty[(String, Long)]) {
          case (acc, (_, v, ts, _)) =>
            if (acc.nonEmpty && acc.last._1 == v) acc else acc :+ (v -> ts)
        }
        runs.zipWithIndex.map { case ((v, from), i) =>
          val to = runs.lift(i + 1).map(_._2)
          (k, v, from, to, to.isEmpty)
        }
      }.sortBy(x => (x._1, x._3, x._4.getOrElse(Long.MaxValue)))
      assert(got.toSeq == model, s"seed=$seed")
    }
  }

  test("exactDedupIds == min-id-per-text model on dup-heavy corpora") {
    for (seed <- 1 to 6) {
      val rows = corpus(seed, 60)
      val df = rows.toDF("doc_id", "source", "text")
      val got = Dedup.exactDedupIds(df, "text", "doc_id")
        .collect().map(_.getLong(0)).toSet
      val model = rows.groupBy(_._3).values.map(_.map(_._1).min).toSet
      assert(got == model, s"seed=$seed")
    }
  }

  test("packSequences: bijection, contiguous seqs, budget, partition-independence") {
    for (seed <- 1 to 4) {
      val rows = corpus(seed, 50)
      val df = rows.toDF("doc_id", "source", "text")
      val cap = 8L
      val out = Pack.packSequences(df.repartition(5), cap)
        .collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      // bijection: every doc exactly once
      assert(out.map(_._2).sorted.toSeq == rows.map(_._1).sorted, s"seed=$seed")
      out.groupBy(_._1).foreach { case (src, grp) =>
        // contiguous sequence numbers from 0
        val seqs = grp.map(_._4).distinct.sorted
        assert(seqs.toSeq == (0L until seqs.length).toSeq, s"seed=$seed src=$src")
        // budget: a sequence exceeds cap only as a single oversized doc
        grp.groupBy(_._4).foreach { case (sq, docs) =>
          val tot = docs.map(_._3).sum
          assert(tot <= cap || docs.length == 1, s"seed=$seed src=$src seq=$sq")
        }
        // greedy: a doc opens a new sequence only because it did not fit
        val byId = grp.sortBy(_._2)
        byId.sliding(2).foreach {
          case Array(a, b) if b._4 != a._4 =>
            val fillBefore = byId.filter(x => x._4 == a._4).map(_._3).sum
            assert(fillBefore + b._3 > cap, s"seed=$seed premature new seq at ${b._2}")
          case _ => ()
        }
      }
      // partition layout must not matter
      val single = Pack.packSequences(df.repartition(1), cap)
        .collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      assert(out.sortBy(x => (x._1, x._2)).toSeq ==
        single.sortBy(x => (x._1, x._2)).toSeq, s"seed=$seed")
    }
  }

  test("snapshotDiff == map-diff model") {
    for (seed <- 1 to 6) {
      val rnd = new Random(seed * 31)
      val oldRows = corpus(seed, 40).filter(_ => rnd.nextDouble() < 0.8)
      val newRows = corpus(seed + 100, 40).filter(_ => rnd.nextDouble() < 0.8)
      val got = Pack.snapshotDiff(
          oldRows.toDF("doc_id", "source", "text"),
          newRows.toDF("doc_id", "source", "text"))
        .collect().map(r => (r.getLong(0), r.getString(1))).toSet
      val o = oldRows.map(r => r._1 -> r._3).toMap
      val n = newRows.map(r => r._1 -> r._3).toMap
      val model =
        (n.keySet -- o.keySet).map(_ -> "added") ++
        (o.keySet -- n.keySet).map(_ -> "removed") ++
        (o.keySet & n.keySet).filter(k => o(k) != n(k)).map(_ -> "changed")
      assert(got == model, s"seed=$seed")
    }
  }
}
