package graft

import org.apache.spark.sql.functions.{coalesce, col, lit, sum}
import graft.operators.Pack

class PackSpec extends SparkTestBase {
  import spark.implicits._

  private def docsOf(rows: (Long, String, String)*) =
    rows.toSeq.toDF("doc_id", "source", "text")

  test("packSequences: hand-checked greedy walk, oversize doc isolated") {
    // tokens per doc: 4, 5, 3, 12(oversize), 2 — capacity 10
    val docs = docsOf(
      (1L, "a", "w w w w"),
      (2L, "a", "w w w w w"),
      (3L, "a", "w w w"),
      (4L, "a", "w w w w w w w w w w w w"),
      (5L, "a", "w w"))
    val got = Pack.packSequences(docs, capacity = 10)
      .orderBy("doc_id").select("doc_id", "seq_no")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    // d1 fill 4; d2 fill 9; d3 would hit 12 -> seq 1 fill 3; d4 oversize
    // -> seq 2 fill 12; d5 -> seq 3 fill 2
    assert(got.toSeq == Seq((1L, 0L), (2L, 0L), (3L, 1L), (4L, 2L), (5L, 3L)))
  }

  test("packSequences: groups pack independently and restart at seq 0") {
    val docs = docsOf(
      (1L, "a", "w w w w w w"), (2L, "a", "w w w w w w"),
      (10L, "b", "w"), (11L, "b", "w"))
    val got = Pack.packSequences(docs, capacity = 10)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(3))).toSet
    assert(got == Set(("a", 1L, 0L), ("a", 2L, 1L), ("b", 10L, 0L), ("b", 11L, 0L)))
  }

  test("packSequences: empty text counts zero tokens and always fits") {
    val docs = docsOf((1L, "a", "w w"), (2L, "a", ""), (3L, "a", "   "))
    val got = Pack.packSequences(docs, capacity = 2)
      .orderBy("doc_id").collect().map(r => (r.getLong(2), r.getLong(3)))
    assert(got.toSeq == Seq((2L, 0L), (0L, 0L), (0L, 0L)))
  }

  test("packSequences: only the sized projection reaches the exchange") {
    // AQE wraps the plan and materializes exchanges lazily — turn it off
    // so ShuffleExchangeExec nodes are visible in the compiled plan
    val plan = ScopedConf.withConf(spark, "spark.sql.adaptive.enabled", "false") {
      Pack.packSequences(
        docsOf((1L, "a", "w")), capacity = 10).queryExecution.executedPlan
    }
    val exchanges = plan.collect {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
    }
    assert(exchanges.nonEmpty)
    // text is projected away before the shuffle: no string column wider
    // than the group key may cross it
    exchanges.foreach { e =>
      val names = e.child.output.map(_.name).toSet
      assert(!names.contains("text"), s"text crossed the exchange: $names")
    }
  }

  test("snapshotDiff: added/removed/changed, unchanged dropped") {
    val oldSnap = docsOf((1L, "s", "same"), (2L, "s", "before"), (3L, "s", "gone"))
    val newSnap = docsOf((1L, "s", "same"), (2L, "s", "after"), (4L, "s", "fresh"))
    val got = Pack.snapshotDiff(oldSnap, newSnap)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(got == Set((2L, "changed"), (3L, "removed"), (4L, "added")))
  }

  test("trainingExport: docs in, capacity-respecting shards out") {
    val dir = java.nio.file.Files.createTempDirectory("texport").toString
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val (nSeqs, nFiles) = Pack.trainingExport(docs, s"$dir/shards",
      capacity = 256, targetFileBytes = 8L * 1024 * 1024)
    assert(nSeqs > 0 && nFiles > 0)
    val back = spark.read.parquet(s"$dir/shards")
    assert(back.count() == nSeqs)
    // every multi-doc sequence respects the budget (single oversized docs
    // may exceed it by contract)
    val over = back.filter(col("n_docs") > 1 && col("n_tokens") > 256).count()
    assert(over == 0)
    // no operator caches leak past the call
    assert(OperatorCaches.liveCount == 0)
  }

  // NOTE (r13 verdict nit #3): q108's own shard tree under java.io.tmpdir
  // is PID-suffixed via Fixtures.scratch — two JVMs on the same sf dir
  // (bench + verify) write disjoint trees instead of clobbering each
  // other's shards mid-read-back, and the Fixtures lifecycle deletes the
  // tree at JVM exit / prunes trees whose owning JVM died.
  test("q108 shard tree is per-PID (concurrent JVMs write disjoint trees)") {
    val pid = java.lang.ProcessHandle.current().pid()
    val name = s"graft_tbuild_${graft.Fixtures.dirKey("/root/testdata/sf0.001")}_p$pid"
    graft.operators.Pack.q108(spark, "/root/testdata/sf0.001").collect()
    val tree = new java.io.File(System.getProperty("java.io.tmpdir"), name)
    assert(tree.isDirectory, s"expected per-PID shard tree at $tree")
    OperatorCaches.release()
  }

  test("trainingBuild: split shards out, eval splits leakage-screened") {
    val dir = java.nio.file.Files.createTempDirectory("tbuild").toString
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val out = Pack.trainingBuild(docs, s"$dir/build",
      capacity = 256, targetFileBytes = 8L * 1024 * 1024)
    assert(out.keySet == Set("train", "val", "test"))
    assert(OperatorCaches.liveCount == 0)
    // recompute the deterministic prep+split to check the screen exactly
    val prepped = graft.operators.Dedup.trainingPrep(docs)
      .withColumn("split",
        graft.ops.Scale.splitOf(col("doc_id").cast("string")))
    val train = prepped.filter(col("split") === "train")
    assert(out("train")._1 == train.count())
    for (name <- Seq("val", "test")) {
      val shard = prepped.filter(col("split") === name)
      val leaked = graft.operators.Dedup
        .crossLeakReport(train, shard, "text", "doc_id", 0.5)
        .select("val_id").collect().map(_.getLong(0)).toSet
      val expected = shard.select("doc_id").collect()
        .map(_.getLong(0)).count(id => !leaked(id))
      assert(out(name)._1 == expected, s"$name docs")
      OperatorCaches.release()
    }
    // shards read back: doc counts inside sequences reconcile per split
    // (a split can legitimately come back empty at tiny scale)
    for ((name, (nDocs, nSeqs, nFiles)) <- out) {
      val back = spark.read.parquet(s"$dir/build/$name")
      assert(back.count() == nSeqs, name)
      val total = back.agg(coalesce(sum(col("n_docs")), lit(0L)))
        .collect()(0).getLong(0)
      assert(total == nDocs, name)
      // n_files left q108's oracle-checked output in round 9 (physical
      // parquet sizes aren't DuckDB-replayable) — pin it here instead:
      // the returned count must match what is actually on disk.
      val onDisk = new java.io.File(s"$dir/build/$name").listFiles()
        .count(f => f.getName.endsWith(".parquet"))
      assert(onDisk == nFiles, s"$name n_files")
      if (nSeqs > 0) assert(nFiles >= 1, s"$name has seqs but no files")
    }
    assert(out.values.map(_._1).sum > 0, "all splits empty")
  }

  test("trainingBuild: an emptied split is still reported with 0 docs/seqs " +
    "(the q108 oracle's split spine — r15 non-ASCII sweep finding)") {
    val dir = java.nio.file.Files.createTempDirectory("tbuild-empty").toString
    // every doc whose deterministic split is 'val' gets quality-failing
    // junk text, so trainingPrep removes it BEFORE the split and the val
    // shard is empty; the build must still report all three splits
    val ids = (0L until 120L)
    val splits = ids.toDF("doc_id")
      .withColumn("split", graft.ops.Scale.splitOf(col("doc_id").cast("string")))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(splits.values.exists(_ == "val"), "fixture ids never hit val")
    val docs = ids.map { id =>
      val text =
        if (splits(id) == "val") "x"
        else "the a of and " + (0 until 80).map(k => s"tok${id}w$k").mkString(" ")
      (id, text, "en", s"src${id % 3}", text.length.toLong)
    }.toDF("doc_id", "text", "lang", "source", "n_chars")
    val out = Pack.trainingBuild(docs, s"$dir/build",
      capacity = 256, targetFileBytes = 8L * 1024 * 1024)
    assert(out.keySet == Set("train", "val", "test"))
    // n_files may be 1: writeSized emits a schema-ful empty parquet, which
    // is exactly what lets q108's read-back of an empty split succeed
    assert((out("val")._1, out("val")._2) == ((0L, 0L)), "empty split row")
    assert(out("train")._1 > 0L, "train survived")
    OperatorCaches.release()
  }

  test("mixSchedule: every prefix holds sources at their weight ratios") {
    val sched = Pack.q99(spark, "/root/testdata/sf0.01").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getInt(3)))
    assert(sched.length == 200)
    // stride scheduling's defining property: weight-w sources hold a ~w
    // share in EVERY prefix, not just at epoch end. 20 sources cycle
    // weights 1..4 (5 sources each); expected docs per weight class in a
    // prefix of n ≈ n·w/10.
    for (n <- Seq(50, 100, 200)) {
      val byW = sched.take(n).groupBy(_._3).view.mapValues(_.length).toMap
      for (w <- 1 to 4) {
        val expected = n * w / 10.0
        val gotN = byW.getOrElse(w, 0)
        assert(math.abs(gotN - expected) <= math.max(4, expected * 0.15),
          s"prefix $n weight $w: got $gotN, expected ~$expected")
      }
    }
    // deterministic: same schedule on re-run
    val again = Pack.q99(spark, "/root/testdata/sf0.01").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getInt(3)))
    assert(sched.toSeq == again.toSeq)
  }

  test("q125 window packing stats match a driver-side prefix-sum reimplementation") {
    val out = Pack.q125(spark, "/root/testdata/sf0.01").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    val W = Pack.PackWindow
    val md = java.security.MessageDigest.getInstance("SHA-256")
    def sha(s0: String): String =
      md.digest(s0.getBytes("UTF-8")).map(b => f"${b & 0xff}%02x").mkString
    val docs = Tables.documents(spark, "/root/testdata/sf0.01")
      .selectExpr("source", "doc_id", "text").collect()
      .map(r => (r.getString(0), r.getLong(1), sha(r.getLong(1).toString),
        "[a-z0-9]+".r.findAllIn(r.getString(2).toLowerCase).length.toLong))
    val expect = docs.groupBy(_._1).toSeq.map { case (src0, ds) =>
      val ordered = ds.sortBy(d => (d._3, d._2))
      var cum = 0L
      var straddle = 0L
      ordered.foreach { case (_, _, _, n) =>
        val start = cum; cum += n
        if (n > 0 && start / W != (cum - 1) / W) straddle += 1
      }
      val nw = (cum + W - 1) / W
      (src0, ds.length.toLong, cum, nw, straddle, nw * W - cum)
    }.sortBy(_._1)
    assert(out.toSeq == expect)
  }
}
