package graft

import org.apache.spark.sql.functions._

/** Contract-level checks: every registered query runs on sf0.001 and the
  * oracle map is consistent with the query map. Value-level correctness is
  * enforced by the DuckDB oracle (tools/check_oracle.py, driver-run). */
class QueriesSpec extends SparkTestBase {

  test("entry returns rows on sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracle key has a query") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracle without query: $missing")
  }

  test("all queries execute and are non-empty on sf0.001") {
    // q19/q26-style anti joins can legitimately shrink, but none should be
    // empty at sf0.001 with the chosen predicates — empty output would make
    // the driver's rows-only check meaningless.
    // q197: the distilled classifier reaches full agreement with its
    // label rule on the fixtures, so the disagreement set is honestly
    // empty — DistillSpec forces the non-empty path on random corpora.
    val allowEmpty = Set("q33_dedup_jaccard", "q34_dedup_minhash",
      "q197_lr_disagreement")
    SparkEntry.queries.foreach { case (name, fn) =>
      val df = fn(spark, sfDir)
      assert(df.columns.nonEmpty, s"$name has no columns")
      val n = df.count()
      if (!allowEmpty(name)) assert(n > 0, s"$name returned 0 rows")
    }
  }

  test("q01 pricing summary has the 6 flag/status groups with exact counts") {
    val rows = graft.ops.RefQueries.q01(spark, sfDir)
      .select("l_returnflag", "l_linestatus", "count_order").collect()
    assert(rows.length == 6)
    val total = rows.map(_.getLong(2)).sum
    val liCount = Tables.lineitem(spark, sfDir)
      .filter(col("l_shipdate") <= to_timestamp(lit("2001-09-02 00:00:00")))
      .count()
    assert(total == liCount, "group counts must partition the filtered table")
  }

  test("q08 pagination: page rows all satisfy the cursor predicate and are sorted") {
    val rows = graft.ops.RefQueries.q08(spark, sfDir)
      .select(date_format(col("o_orderdate"), "yyyy-MM-dd HH:mm:ss"),
        col("o_orderkey")).collect()
    assert(rows.nonEmpty && rows.length <= 100)
    val keys = rows.map(r => (r.getString(0), r.getLong(1)))
    assert(keys.sameElements(keys.sorted), "page must be sorted by (date, key)")
  }

  test("q07 union-distinct: airports contain both supp and part key domains") {
    val airports = graft.ops.RefQueries.q07(spark, sfDir).collect().map(_.getLong(0)).toSet
    val supp = Tables.lineitem(spark, sfDir).select("l_suppkey").distinct()
      .collect().map(_.getLong(0)).toSet
    assert(supp.subsetOf(airports))
  }

  test("q112 BM25: scores match a driver-side reimplementation") {
    val out = graft.ops.TextQueries.q112(spark, sfDir).collect()
    assert(out.length == 10)
    val scores = out.map(_.getAs[Double]("score"))
    assert(scores.sameElements(scores.sorted(Ordering[Double].reverse)),
      "top-k must be sorted by score desc")
    // independent reimplementation from raw text (plain Scala, no Spark)
    val terms = graft.ops.TextQueries.Bm25Terms
    val docs = Tables.documents(spark, sfDir).selectExpr("doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        "[a-z0-9]+".r.findAllIn(r.getString(1).toLowerCase).toVector)
    val n = docs.length.toDouble
    val avgdl = docs.map(_._2.length.toLong).sum.toDouble / n
    val df = terms.map(t => t -> docs.count(_._2.contains(t))).toMap
    val expect = docs.map { case (id, toks) =>
      val dl = toks.length
      val s = terms.map { t =>
        val tf = toks.count(_ == t)
        math.log(1.0 + (n - df(t) + 0.5) / (df(t) + 0.5)) * (tf * 2.2) /
          (tf + 1.2 * (0.25 + 0.75 * dl / avgdl))
      }.sum
      (id, math.round(s * 10000) / 10000.0)
    }.filter { case (id, _) =>
      terms.exists(t => docs.find(_._1 == id).get._2.contains(t))
    }.sortBy { case (id, sc) => (-sc, id) }.take(10)
    out.zip(expect).foreach { case (row, (id, sc)) =>
      assert(row.getAs[Long]("doc_id") == id)
      assert(math.abs(row.getAs[Double]("score") - sc) < 1e-9,
        s"doc $id: ${row.getAs[Double]("score")} vs $sc")
    }
  }

  test("q116 domain tokens: exactly top-3 per source, lor formula verified") {
    val out = graft.ops.TextQueries.q116(spark, sfDir).collect()
    val bySource = out.groupBy(_.getAs[String]("source"))
    bySource.foreach { case (src, rows) =>
      assert(rows.length == 3, s"$src has ${rows.length} rows")
      val lors = rows.map(_.getAs[Double]("lor"))
      assert(lors.sameElements(lors.sorted(Ordering[Double].reverse)))
    }
    // recompute one row's log-odds from its own integer counts + totals
    val toks = Tables.documents(spark, sfDir).selectExpr("source", "text")
      .collect().map(r => r.getString(0) ->
        "[a-z0-9]+".r.findAllIn(r.getString(1).toLowerCase).toVector)
    val srcTotal = toks.groupBy(_._1).map { case (s0, xs) =>
      s0 -> xs.map(_._2.length.toLong).sum }
    val grand = srcTotal.values.sum
    val r0 = out.head
    val (src, tokn) = (r0.getAs[String]("source"), r0.getAs[String]("token"))
    val a = r0.getAs[Long]("n_in").toDouble
    val c = r0.getAs[Long]("n_out").toDouble
    val bigA = srcTotal(src).toDouble
    val bigC = (grand - srcTotal(src)).toDouble
    val lor = math.round((math.log((a + 1.0) / (bigA - a + 1.0)) -
      math.log((c + 1.0) / (bigC - c + 1.0))) * 10000) / 10000.0
    assert(math.abs(r0.getAs[Double]("lor") - lor) < 1e-9, s"$src/$tokn")
    // n_in really is the (source, token) count
    assert(a.toLong == toks.filter(_._1 == src).map(_._2.count(_ == tokn)).sum)
  }

  test("q117 BPE pairs: counts match a driver-side reimplementation") {
    val out = graft.ops.TextQueries.q117(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    assert(out.length == 20)
    val counts = scala.collection.mutable.Map.empty[(String, String), Long]
    Tables.documents(spark, sfDir).select("text").collect().foreach { r =>
      "[a-z0-9]+".r.findAllIn(r.getString(0).toLowerCase).foreach { w =>
        w.sliding(2).filter(_.length == 2).foreach { p =>
          val k = (p.substring(0, 1), p.substring(1, 2))
          counts(k) = counts.getOrElse(k, 0L) + 1L
        }
      }
    }
    val expect = counts.toSeq.map { case ((l, r), n) => (l, r, n) }
      .sortBy { case (l, r, n) => (-n, l, r) }.take(20)
    assert(out.toSeq == expect)
  }

  test("q118 BPE merges: round 1 equals q117's top pair; later rounds merge merged symbols") {
    val merges = graft.ops.TextQueries.q118(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
    assert(merges.length == 10 && merges.map(_._1).toSeq == (1L to 10L))
    val top = graft.ops.TextQueries.q117(spark, sfDir).collect().head
    assert((merges.head._2, merges.head._3, merges.head._4) ==
      ((top.getString(0), top.getString(1), top.getLong(2))))
    assert(merges.forall(_._4 > 0))
    // determinism: a second run yields the identical merge table
    val again = graft.ops.TextQueries.q118(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
    assert(merges.toSeq == again.toSeq)
  }

  test("q119 split drift: counts come from the q97 split, contrib formula holds") {
    val out = graft.ops.TextQueries.q119(spark, sfDir).collect()
    assert(out.length == 10)
    val md = java.security.MessageDigest.getInstance("SHA-256")
    def splitOf(id: Long): String = {
      val h = md.digest(s"split:$id".getBytes("UTF-8"))
        .take(1).map(b => f"${b & 0xff}%02x").mkString
      if (h < "cc") "train" else if (h < "e6") "val" else "test"
    }
    val docs = Tables.documents(spark, sfDir).selectExpr("doc_id", "text")
      .collect().map(r => splitOf(r.getLong(0)) ->
        "[a-z0-9]+".r.findAllIn(r.getString(1).toLowerCase).toVector)
      .filter(d => d._1 == "train" || d._1 == "val")
    val a = scala.collection.mutable.Map.empty[String, Long]
    val b = scala.collection.mutable.Map.empty[String, Long]
    docs.foreach { case (sp, toks) =>
      val m = if (sp == "train") a else b
      toks.foreach(t => m(t) = m.getOrElse(t, 0L) + 1L)
    }
    val vocab = (a.keySet ++ b.keySet)
    val (at, bt, vs) = (a.values.sum.toDouble, b.values.sum.toDouble,
      vocab.size.toDouble)
    out.foreach { r =>
      val t = r.getAs[String]("token")
      assert(r.getAs[Long]("n_train") == a.getOrElse(t, 0L))
      assert(r.getAs[Long]("n_val") == b.getOrElse(t, 0L))
      val p = (a.getOrElse(t, 0L) + 1.0) / (at + vs)
      val q = (b.getOrElse(t, 0L) + 1.0) / (bt + vs)
      val contrib = math.round(p * math.log(p / q) * 10000000) / 10000000.0
      assert(math.abs(r.getAs[Double]("contrib") - contrib) < 1e-9, t)
    }
  }

  private def docTokens(): Array[(Long, String, Vector[String])] =
    Tables.documents(spark, sfDir).selectExpr("doc_id", "source", "text")
      .collect().map(r => (r.getLong(0), r.getString(1),
        "[a-z0-9]+".r.findAllIn(r.getString(2).toLowerCase).toVector))

  private def sha2split(id: Long): String = {
    val h = java.security.MessageDigest.getInstance("SHA-256")
      .digest(s"split:$id".getBytes("UTF-8"))
      .take(1).map(b => f"${b & 0xff}%02x").mkString
    if (h < "cc") "train" else if (h < "e6") "val" else "test"
  }

  test("q120 LM perplexity: xent matches a driver-side bigram LM exactly") {
    val out = graft.ops.TextQueries.q120(spark, sfDir).collect()
    assert(out.length == 20)
    val docs = docTokens().map { case (id, _, toks) => (id, sha2split(id), toks) }
    val lm = scala.collection.mutable.Map.empty[(String, String), Long]
    val vocab = scala.collection.mutable.Set.empty[String]
    docs.filter(_._2 == "train").foreach { case (_, _, toks) =>
      toks.foreach(vocab += _)
      toks.sliding(2).filter(_.length == 2)
        .foreach(p => lm((p(0), p(1))) = lm.getOrElse((p(0), p(1)), 0L) + 1L)
    }
    val ctx = lm.groupBy(_._1._1).map { case (w, m) => w -> m.values.sum }
    val v = vocab.size.toDouble
    val expect = docs.flatMap { case (id, sp, toks) =>
      val bs = toks.sliding(2).filter(_.length == 2).toSeq
      if (bs.isEmpty) None
      else {
        val nll = bs.map { p =>
          val c = lm.getOrElse((p(0), p(1)), 0L).toDouble
          val ct = ctx.getOrElse(p(0), 0L).toDouble
          math.round(-math.log((c + 1.0) / (ct + v)) * 10000000)
        }.sum
        Some((id, sp, bs.length.toLong, nll, nll.toDouble / bs.length / 1e7))
      }
    }.sortBy { case (id, _, _, _, x) => (-x, id) }.take(20)
    out.zip(expect).foreach { case (r, (id, sp, nb, nll, x)) =>
      assert(r.getAs[Long]("doc_id") == id, s"doc order: $r vs $id")
      assert(r.getAs[String]("split") == sp)
      assert(r.getAs[Long]("n_bigrams") == nb)
      assert(r.getAs[Long]("nll_e7") == nll, s"doc $id fixed-point sum")
      assert(r.getAs[Double]("xent") == x, s"doc $id xent must be bit-exact")
    }
  }

  /** Reference greedy BPE: apply each merge left-to-right, return pieces. */
  private def encodePieces(w: String, merges: Seq[(String, String)]): Int = {
    var syms = w.map(_.toString).toVector
    merges.foreach { case (l, r) =>
      val out = Vector.newBuilder[String]
      var i = 0
      while (i < syms.length) {
        if (i + 1 < syms.length && syms(i) == l && syms(i + 1) == r) {
          out += (l + r); i += 2
        } else { out += syms(i); i += 1 }
      }
      syms = out.result()
    }
    syms.length
  }

  test("q121 single-merge BPE: per-source stats match a driver reimplementation") {
    val out = graft.ops.TextQueries.q121(spark, sfDir).collect()
    val docs = docTokens()
    val pairCounts = scala.collection.mutable.Map.empty[(String, String), Long]
    val freq = scala.collection.mutable.Map.empty[String, Long]
    docs.foreach(_._3.foreach(w => freq(w) = freq.getOrElse(w, 0L) + 1L))
    freq.foreach { case (w, f) =>
      w.sliding(2).filter(_.length == 2).foreach { p =>
        val k = (p.substring(0, 1), p.substring(1, 2))
        pairCounts(k) = pairCounts.getOrElse(k, 0L) + f
      }
    }
    val (l, r) = pairCounts.toSeq.minBy { case ((a, b), n) => (-n, a, b) }._1
    val bySource = docs.flatMap { case (_, src, toks) => toks.map(src -> _) }
      .groupBy(_._1)
    out.foreach { row =>
      val ws = bySource(row.getAs[String]("source")).map(_._2)
      assert(row.getAs[Long]("n_words") == ws.length)
      assert(row.getAs[Long]("n_chars_tok") == ws.map(_.length.toLong).sum)
      val pieces = ws.map(w => encodePieces(w, Seq((l, r))).toLong).sum
      assert(row.getAs[Long]("n_pieces") == pieces,
        s"${row.getAs[String]("source")}: single-merge piece count")
    }
  }

  test("q122 BPE encode: marker-replace chain equals reference greedy BPE; rounds=1 ≡ q121; rounds=0 ≡ chars") {
    val docs = docTokens()
    val freq = scala.collection.mutable.Map.empty[String, Long]
    docs.foreach(_._3.foreach(w => freq(w) = freq.getOrElse(w, 0L) + 1L))
    val capped = freq.toSeq.sortBy { case (w, f) => (-f, w) }.take(65536)
    val merges = graft.ops.TextQueries.bpeMergeRounds(capped, 10)
      .map { case (_, l, r, _) => (l, r) }
    val out = graft.ops.TextQueries.q122(spark, sfDir).collect()
    val bySource = docs.flatMap { case (_, src, toks) => toks.map(src -> _) }
      .groupBy(_._1)
    out.foreach { row =>
      val ws = bySource(row.getAs[String]("source")).map(_._2)
      val pieces = ws.map(w => encodePieces(w, merges).toLong).sum
      assert(row.getAs[Long]("n_pieces") == pieces,
        s"${row.getAs[String]("source")}: 10-round piece count")
      assert(row.getAs[Long]("n_pieces") >= row.getAs[Long]("n_words"))
      assert(row.getAs[Long]("n_pieces") <= row.getAs[Long]("n_chars_tok"))
    }
    // rounds=1 must equal q121's SQL-expressible single-merge twin
    val one = graft.ops.TextQueries.bpeEncodeStats(spark, sfDir, 1).collect()
    val q121 = graft.ops.TextQueries.q121(spark, sfDir).collect()
    assert(one.map(_.toSeq).toSeq == q121.map(_.toSeq).toSeq)
    // rounds=0: the marker wrap alone must count exactly one piece per char
    graft.ops.TextQueries.bpeEncodeStats(spark, sfDir, 0).collect().foreach {
      row => assert(row.getAs[Long]("n_pieces") == row.getAs[Long]("n_chars_tok"))
    }
  }

  test("q127 incremental stats: merged partials equal the direct full aggregation") {
    val merged = graft.ops.Stats.q127(spark, sfDir).collect().map(_.toSeq)
    val direct = Tables.documents(spark, sfDir)
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("sum_chars"),
        min(col("n_chars")).as("min_chars"),
        max(col("n_chars")).as("max_chars"))
      .select(col("source"), col("n_docs"), col("sum_chars"),
        col("min_chars"), col("max_chars"),
        (round(col("sum_chars").cast("double") / col("n_docs") * 10000)
          / 10000.0).as("avg_chars"))
      .orderBy(col("source")).collect().map(_.toSeq)
    assert(merged.nonEmpty)
    assert(merged.toSeq == direct.toSeq)
    // the batch split is non-trivial: both sides contribute rows
    val docs = Tables.documents(spark, sfDir)
    assert(docs.where(col("doc_id") % 7 === 0).count() > 0)
    assert(docs.where(col("doc_id") % 7 =!= 0).count() > 0)
  }

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  test("q129 semdedup: counts reconcile with a driver-side pairwise prune") {
    val out = graft.operators.Similarity.q129(spark, sfDir).collect()
    val vecs = Tables.embeddings(spark, sfDir)
      .selectExpr("vec_id", "label", "cast(embedding as array<double>) v")
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getSeq[Double](2).toArray))
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) { d += a(i)*b(i); na += a(i)*a(i); nb += b(i)*b(i); i += 1 }
      d / (math.sqrt(na) * math.sqrt(nb))
    }
    val byLabel = vecs.groupBy(_._2)
    val expect = byLabel.map { case (lbl, vs) =>
      val sorted = vs.sortBy(_._1)
      val dropped = sorted.count { case (id, _, v) =>
        sorted.exists { case (id2, _, v2) =>
          id2 < id && math.round(cos(v2, v) * 10000) / 10000.0 >= 0.5 }
      }
      lbl -> (vs.length.toLong, vs.length.toLong - dropped, dropped.toLong)
    }
    assert(out.length == byLabel.size)
    out.foreach { r =>
      val (nv, nk, nd) = expect(r.getAs[Int]("label"))
      assert(r.getAs[Long]("n_vecs") == nv)
      assert(r.getAs[Long]("n_kept") == nk, s"label ${r.get(0)}")
      assert(r.getAs[Long]("n_dropped") == nd)
      assert(nk >= 1, "every non-empty cluster keeps at least its chain head")
    }
  }

  test("q130 chunker: stride/size/digest match a driver-side re-chunk") {
    val out = graft.ops.TextQueries.q130(spark, sfDir).collect()
    val docs = Tables.documents(spark, sfDir).selectExpr("doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        "[^\\t\\n\\f\\r ]+".r.findAllIn(r.getString(1)).toVector)
    val expect = docs.filter(_._2.nonEmpty).flatMap { case (id, toks) =>
      val n = toks.length
      (0 until (n + 47) / 48).map { k =>
        val chunk = toks.slice(k * 48, math.min(k * 48 + 64, n))
        (id, k.toLong, k * 48L + 1, chunk.length.toLong,
          md5hex(chunk.mkString(" ")))
      }
    }.sortBy(t => (t._1, t._2))
    assert(out.length == expect.length)
    out.zip(expect).foreach { case (row, (id, k, st, nc, h)) =>
      assert(row.getAs[Long]("doc_id") == id)
      assert(row.getAs[Long]("chunk_idx") == k)
      assert(row.getAs[Long]("start_tok") == st)
      assert(row.getAs[Long]("n_chunk_tokens") == nc)
      assert(row.getAs[String]("chunk_md5") == h, s"doc $id chunk $k")
    }
  }

  test("q131 length buckets: padding identity and full partition of docs") {
    val out = graft.operators.Pack.q131(spark, sfDir).collect()
    val total = Tables.documents(spark, sfDir).count()
    assert(out.map(_.getAs[Long]("n_docs")).sum == total)
    val valid = Set(32L, 64L, 128L, 256L, 512L, 1024L, 2048L)
    out.foreach { r =>
      val b = r.getAs[Long]("bucket")
      assert(valid(b))
      // every doc pads up to exactly its bucket size
      assert(r.getAs[Long]("sum_padding") ==
        b * r.getAs[Long]("n_docs") - r.getAs[Long]("sum_tokens"))
      if (b < 2048L) assert(r.getAs[Long]("sum_truncated") == 0L)
    }
  }

  test("q132 shuffle shards: md5 ordering verified driver-side for one shard") {
    val rows = graft.ops.Scale.q132(spark, sfDir).collect()
    val total = Tables.documents(spark, sfDir).count()
    assert(rows.map(_.getAs[Long]("n_docs")).sum == total)
    assert(rows.forall(r => (0L to 15L).contains(r.getAs[Long]("shard_id"))))
    val keyed = Tables.documents(spark, sfDir).selectExpr("doc_id").collect()
      .map(_.getLong(0)).map(id => (id, md5hex(s"graft-shuffle-42:$id")))
    val shard0 = keyed.filter(_._2.startsWith("0")).sortBy(t => (t._2, t._1))
    val r0 = rows.find(_.getAs[Long]("shard_id") == 0L).get
    assert(r0.getAs[Long]("n_docs") == shard0.length)
    assert(r0.getAs[String]("first_key") == shard0.head._2)
    assert(r0.getAs[String]("last_key") == shard0.last._2)
    assert(r0.getAs[String]("head3") ==
      shard0.take(3).map(_._1).mkString(","))
  }

  test("q134 embed decontam: flags exactly the train vecs near any eval vec") {
    val out = graft.operators.Similarity.q134(spark, sfDir).collect()
    val vecs = Tables.embeddings(spark, sfDir)
      .selectExpr("vec_id", "label", "cast(embedding as array<double>) v")
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getSeq[Double](2).toArray))
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) { d += a(i)*b(i); na += a(i)*a(i); nb += b(i)*b(i); i += 1 }
      d / (math.sqrt(na) * math.sqrt(nb))
    }
    val ev = vecs.filter(_._2 < 2).map(_._3)
    val tr = vecs.filter(_._2 >= 2)
    val expect = tr.groupBy(_._2).map { case (lbl, vs) =>
      val contam = vs.count { case (_, _, v) =>
        ev.exists(e => math.round(cos(v, e) * 10000) / 10000.0 >= 0.5) }
      lbl -> (vs.length.toLong, contam.toLong)
    }
    assert(out.length == expect.size)
    assert(out.forall(r => r.getAs[Int]("label") >= 2), "eval labels excluded")
    out.foreach { r =>
      val (n, c) = expect(r.getAs[Int]("label"))
      assert(r.getAs[Long]("n_train") == n)
      assert(r.getAs[Long]("n_contaminated") == c, s"label ${r.get(0)}")
      assert(r.getAs[Long]("n_clean") == n - c)
    }
  }

  test("q135 token budget: greedy quality-ranked selection reaches the budget") {
    val out = graft.ops.TextQueries.q135(spark, sfDir).collect()
    val docs = Tables.documents(spark, sfDir).selectExpr("doc_id", "source", "text")
      .collect().map { r =>
        val t = r.getString(2)
        def cnt(re: String) = re.r.findAllIn(t).length.toLong
        val logit = 20000L + 15L * cnt("[^\\t\\n\\f\\r ]+") +
          400L * cnt("\\b(the|a|of|and|to|in)\\b") - 250L * cnt("[.,!?;:]") -
          120L * cnt("[0-9]") - 600L * cnt("\\b[A-Z]{2,}\\b")
        (r.getLong(0), r.getString(1), cnt("[^\\t\\n\\f\\r ]+"), logit)
      }
    docs.groupBy(_._2).foreach { case (src, ds) =>
      val total = ds.map(_._3).sum
      val budget = 3 * total / 10
      val ranked = ds.sortBy(d => (-d._4, d._1))
      var cum = 0L
      val sel = ranked.takeWhile { d => val keep = cum < budget; cum += d._3; keep }
      val row = out.find(_.getAs[String]("source") == src).get
      assert(row.getAs[Long]("n_docs") == ds.length.toLong)
      assert(row.getAs[Long]("n_selected") == sel.length.toLong, src)
      assert(row.getAs[Long]("sel_tokens") == sel.map(_._3).sum)
      assert(row.getAs[Long]("budget_tokens") == budget)
      // greedy selection always reaches (or ties) the budget
      assert(sel.map(_._3).sum >= budget || sel.length == ds.length)
    }
  }

  test("q137 source epochs: integer mixing plan matches a reimplementation") {
    val out = graft.operators.Pack.q137(spark, sfDir).collect()
    val toks = Tables.documents(spark, sfDir).selectExpr("source", "text")
      .collect().map(r => r.getString(0) ->
        "[^\\t\\n\\f\\r ]+".r.findAllIn(r.getString(1)).length.toLong)
    val per = toks.groupBy(_._1).map { case (s, xs) => s -> xs.map(_._2).sum }
      .filter(_._2 > 0)
    val total = per.values.sum
    val budget = total / per.size
    out.foreach { r =>
      val n = per(r.getAs[String]("source"))
      val reps = math.min((budget + n - 1) / n, 4L)
      assert(r.getAs[Long]("n_tokens") == n)
      assert(r.getAs[Long]("budget_tokens") == budget)
      assert(r.getAs[Long]("repeats") == reps)
      assert(r.getAs[Long]("upsampled_tokens") == reps * n)
      assert(r.getAs[Long]("deficit_tokens") == math.max(budget - reps * n, 0L))
      // a source only carries a deficit when the epoch cap binds
      if (r.getAs[Long]("deficit_tokens") > 0) assert(reps == 4L)
    }
    assert(out.length == per.size)
  }

  test("q138 mixed lang: doc majority/mixed flags match a driver re-chunk") {
    val out = graft.ops.TextQueries.q138(spark, sfDir).collect()
    val docs = Tables.documents(spark, sfDir).selectExpr("doc_id", "lang", "text")
      .collect().map(r => (r.getLong(0), r.getString(1),
        "[^\\t\\n\\f\\r ]+".r.findAllIn(r.getString(2)).toVector))
    def pred(ct: String): String = {
      def c(re: String) = re.r.findAllIn(ct).length
      val (en, de, es, fr, zh) = (c("\\b(the|a|is|of)\\b"), c("\\b(der|die|und|ist)\\b"),
        c("\\b(el|los|es|y)\\b"), c("\\b(le|les|est|et)\\b"), c("的|是"))
      if (en > 0 && en >= Seq(de, es, fr, zh).max) "en"
      else if (de > 0 && de >= Seq(es, fr, zh).max) "de"
      else if (es > 0 && es >= Seq(fr, zh).max) "es"
      else if (fr > 0 && fr >= zh) "fr"
      else if (zh > 0) "zh" else "und"
    }
    val perDoc = docs.filter(_._3.nonEmpty).map { case (_, lang, toks) =>
      val preds = (0 until (toks.length + 47) / 48).map { k =>
        pred(toks.slice(k * 48, math.min(k * 48 + 64, toks.length)).mkString(" ")) }
      val counts = preds.groupBy(identity).map { case (p, xs) => p -> xs.length }
      val majority = counts.toSeq.sortBy { case (p, n) => (-n, p) }.head._1
      (lang, counts.size > 1, majority == "und")
    }
    val expect = perDoc.groupBy(_._1).map { case (lang, xs) =>
      lang -> (xs.length.toLong, xs.count(_._2).toLong, xs.count(_._3).toLong) }
    assert(out.length == expect.size)
    out.foreach { r =>
      val (n, mixed, und) = expect(r.getAs[String]("lang"))
      assert(r.getAs[Long]("n_docs") == n)
      assert(r.getAs[Long]("n_mixed") == mixed, s"lang ${r.get(0)}")
      assert(r.getAs[Long]("n_und_majority") == und)
    }
  }

  test("q139 cluster best: rep is argmax quality within each q67 cluster") {
    val reps = graft.operators.Clusters.q139(spark, sfDir).collect()
    val members = graft.operators.Clusters.q67(spark, sfDir).collect()
      .map(r => (r.getAs[Long]("cluster"), r.getAs[Long]("doc_id")))
      .groupBy(_._1).map { case (c, xs) => c -> xs.map(_._2).toSet }
    val docs = Tables.documents(spark, sfDir)
      .selectExpr("doc_id", "text", "n_chars").collect().map { r =>
        val t = r.getString(1)
        def cnt(re: String) = re.r.findAllIn(t).length.toLong
        val logit = 20000L + 15L * cnt("[^\\t\\n\\f\\r ]+") +
          400L * cnt("\\b(the|a|of|and|to|in)\\b") - 250L * cnt("[.,!?;:]") -
          120L * cnt("[0-9]") - 600L * cnt("\\b[A-Z]{2,}\\b")
        r.getLong(0) -> (logit, r.getLong(2))
      }.toMap
    assert(reps.length == members.size)
    reps.foreach { r =>
      val c = r.getAs[Long]("cluster")
      val ms = members(c)
      val best = ms.toSeq.map(id => (id, docs(id)._1))
        .sortBy { case (id, l) => (-l, id) }.head
      assert(r.getAs[Long]("rep_doc") == best._1, s"cluster $c")
      assert(r.getAs[Long]("rep_logit_1e4") == best._2)
      assert(r.getAs[Long]("n_members") == ms.size.toLong)
      assert(r.getAs[Long]("n_dropped") == ms.size.toLong - 1)
      assert(r.getAs[Long]("chars_dropped") ==
        ms.toSeq.map(id => docs(id)._2).sum - docs(best._1)._2)
    }
  }

  test("q140 hard negatives: mid-rank band matches a brute-force driver rank") {
    val out = graft.operators.Similarity.q140(spark, sfDir).collect()
    val vecs = Tables.embeddings(spark, sfDir)
      .selectExpr("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray)
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0
      var i = 0
      while (i < a.length) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      d / (math.sqrt(na) * math.sqrt(nb))
    }
    val expect = vecs.filter(_._1 % 100 == 0).flatMap { case (qid, qv) =>
      vecs.filter(_._1 != qid)
        .map { case (id, v) => (id, math.round(cos(v, qv) * 10000) / 10000.0) }
        .sortBy { case (id, c) => (-c, id) }
        .zipWithIndex.map { case ((id, c), i) => (qid, id, c, i + 1L) }
        .filter { case (_, _, _, rk) => rk >= 4 && rk <= 13 }
    }
    assert(out.length == expect.length)
    out.zip(expect.sortBy(e => (e._1, e._4))).foreach { case (r, (qid, id, c, rk)) =>
      assert(r.getAs[Long]("qid") == qid)
      assert(r.getAs[Long]("neg_id") == id, s"qid $qid rank $rk")
      assert(math.abs(r.getAs[Double]("cos_sim") - c) < 1e-9)
      assert(r.getAs[Long]("rank") == rk)
    }
  }

  test("q141 cdc chunks: per-source stats match a driver re-chunk") {
    val out = graft.ops.TextQueries.q141(spark, sfDir).collect()
    def hex(alg: String, s: String): String =
      java.security.MessageDigest.getInstance(alg)
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val chunks = Tables.documents(spark, sfDir).selectExpr("source", "text")
      .collect().flatMap { r =>
        val toks = "[^\\t\\n\\f\\r ]+".r.findAllIn(r.getString(1)).toVector
        if (toks.isEmpty) Nil
        else {
          val bpos = toks.indices.filter(i => "01".contains(hex("SHA-256", toks(i)).head))
          val starts = 0 +: bpos.map(_ + 1)
          val ends = bpos :+ (toks.length - 1)
          starts.zip(ends).filter { case (s, e) => s <= e }.map { case (s, e) =>
            (r.getString(0), (e - s + 1).toLong, hex("MD5", toks.slice(s, e + 1).mkString(" ")))
          }
        }
      }
    val expect = chunks.groupBy(_._1).map { case (src, xs) =>
      src -> (xs.length.toLong, xs.map(_._3).distinct.length.toLong, xs.map(_._2).sum)
    }
    assert(out.length == expect.size)
    out.foreach { r =>
      val (n, nd, st) = expect(r.getAs[String]("source"))
      assert(r.getAs[Long]("n_chunks") == n)
      assert(r.getAs[Long]("n_distinct_chunks") == nd, s"source ${r.get(0)}")
      assert(r.getAs[Long]("sum_chunk_tokens") == st)
      assert(r.getAs[Double]("dup_ratio_1e4") == (n - nd) * 10000.0 / n)
      assert(r.getAs[Double]("mean_chunk_tokens_1e4") == st * 10000.0 / n)
    }
  }

  test("q147 doc ledger: columns agree with q67 clusters and driver exact dedup") {
    val out = graft.operators.Clusters.q147(spark, sfDir).collect()
    val clusters = graft.operators.Clusters.q67(spark, sfDir).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("cluster")).toMap
    val docs = Tables.documents(spark, sfDir)
      .selectExpr("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1))
    val exactRep = docs.groupBy(_._2).values
      .flatMap(xs => xs.map(_._1 -> xs.map(_._1).min)).toMap
    assert(out.length == docs.length)
    out.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      assert(r.getAs[Long]("exact_rep") == exactRep(id), s"doc $id")
      assert(r.getAs[Long]("dup_group") == clusters.getOrElse(id, id), s"doc $id")
      val verdict = r.getAs[String]("verdict")
      assert((verdict == "drop_dup") == (r.getAs[Long]("dup_group") != id))
      if (verdict == "drop_quality") assert(r.getAs[String]("quality") == "lo")
      if (verdict == "keep") assert(r.getAs[String]("quality") != "lo")
    }
    // every verdict class must be live on the fixture
    assert(out.map(_.getAs[String]("verdict")).toSet ==
      Set("keep", "drop_dup", "drop_quality"))
  }

  test("q148 ledger delta: incremental result equals the q147 full recompute") {
    val full = graft.operators.Clusters.q147(spark, sfDir).collect()
    val inc = graft.operators.Clusters.q148(spark, sfDir).collect()
    assert(full.length == inc.length)
    full.zip(inc).foreach { case (f, i) =>
      assert(f == i, s"ledger divergence at doc ${f.get(0)}")
    }
    // the merge paths must be live: at least one final cluster must span
    // a batch (doc_id%5=0) and a history doc, else the contraction logic
    // went untested
    val spanning = inc.groupBy(_.getAs[Long]("dup_group"))
      .values.exists(rows => rows.exists(_.getAs[Long]("doc_id") % 5 == 0) &&
        rows.exists(_.getAs[Long]("doc_id") % 5 != 0))
    assert(spanning, "fixture has no batch+history spanning cluster")
  }

  test("q146 stream gate: dual-sink read-back matches a batch gate replay") {
    val out = graft.streaming.EventsStream.q146(spark, sfDir).collect()
    def sha(s: String): String =
      java.security.MessageDigest.getInstance("SHA-256")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val expect = Tables.documents(spark, sfDir).selectExpr("text").collect()
      .map(_.getString(0)).distinct.map { t =>
        def cnt(re: String) = re.r.findAllIn(t).length.toLong
        val logit = 20000L + 15L * cnt("[^\\t\\n\\f\\r ]+") +
          400L * cnt("\\b(the|a|of|and|to|in)\\b") - 250L * cnt("[.,!?;:]") -
          120L * cnt("[0-9]") - 600L * cnt("\\b[A-Z]{2,}\\b")
        sha(t) -> (if (logit >= 21200L) "accept" else "quarantine")
      }.toMap
    assert(out.length == expect.size)
    // both sinks must be live on the fixture
    assert(out.map(_.getAs[String]("verdict")).toSet == Set("accept", "quarantine"))
    out.foreach { r =>
      assert(expect(r.getAs[String]("fp")) == r.getAs[String]("verdict"))
    }
  }

  test("q145 quality sample: stratified keep decisions match a driver replay") {
    val out = graft.ops.TextQueries.q145(spark, sfDir).collect()
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val docs = Tables.documents(spark, sfDir)
      .selectExpr("doc_id", "source", "text").collect().map { r =>
        val t = r.getString(2)
        def cnt(re: String) = re.r.findAllIn(t).length.toLong
        val logit = 20000L + 15L * cnt("[^\\t\\n\\f\\r ]+") +
          400L * cnt("\\b(the|a|of|and|to|in)\\b") - 250L * cnt("[.,!?;:]") -
          120L * cnt("[0-9]") - 600L * cnt("\\b[A-Z]{2,}\\b")
        val label = if (logit >= 23000L) "hi" else if (logit >= 21200L) "mid" else "lo"
        val u = md5hex(r.getLong(0).toString).head
        val kept = label == "hi" || (label == "mid" && u < '8') ||
          (label == "lo" && u < '1')
        ((r.getString(1), label), (cnt("[^\\t\\n\\f\\r ]+"), kept))
      }
    val expect = docs.groupBy(_._1).map { case (k, xs) =>
      k -> (xs.length.toLong, xs.count(_._2._2).toLong,
        xs.map(_._2._1).sum, xs.filter(_._2._2).map(_._2._1).sum)
    }
    assert(out.length == expect.size)
    // all three strata must be live on the fixture, else the policy is
    // untested
    assert(Set("hi", "mid", "lo").subsetOf(
      out.map(_.getAs[String]("label")).toSet))
    out.foreach { r =>
      val e = expect((r.getAs[String]("source"), r.getAs[String]("label")))
      assert((r.getAs[Long]("n_docs"), r.getAs[Long]("n_kept"),
        r.getAs[Long]("tok_docs"), r.getAs[Long]("tok_kept")) == e)
    }
  }

  test("q144 ngram novelty: histogram matches a driver shingle recount") {
    val out = graft.operators.Dedup.q144(spark, sfDir).collect()
    val docs = Tables.documents(spark, sfDir).selectExpr("doc_id", "text")
      .collect().map { r =>
        val toks = "[^\\t\\n\\f\\r ]+".r.findAllIn(r.getString(1)).toVector
        val grams =
          if (toks.length < 8) Set(toks.mkString(" "))
          else toks.sliding(8).map(_.mkString(" ")).toSet
        (r.getLong(0), toks.length.toLong, grams)
      }
    val gramDocs = docs.flatMap { case (id, _, gs) => gs.map(_ -> id) }
      .groupBy(_._1).map { case (g, xs) => g -> xs.map(_._2).distinct.length }
    val expect = docs.map { case (_, nt, gs) =>
      val dup = gs.count(g => gramDocs(g) >= 2).toLong
      (dup * 10 / gs.size, nt)
    }.groupBy(_._1).map { case (b, xs) =>
      b -> (xs.length.toLong, xs.map(_._2).sum) }
    assert(out.length == expect.size)
    out.foreach { r =>
      val (n, st) = expect(r.getAs[Long]("bucket"))
      assert(r.getAs[Long]("n_docs") == n, s"bucket ${r.get(0)}")
      assert(r.getAs[Long]("sum_tokens") == st)
    }
  }

  test("q143 dedup funnel: exact stage matches driver sha dedup; funnel monotone") {
    val out = graft.operators.Clusters.q143(spark, sfDir).collect()
    val docs = Tables.documents(spark, sfDir)
      .selectExpr("doc_id", "source", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2),
        "[^\\t\\n\\f\\r ]+".r.findAllIn(r.getString(2)).length.toLong))
    val keep = docs.groupBy(_._3).values.map(_.map(_._1).min).toSet
    val base = docs.groupBy(_._2).map { case (s, xs) =>
      s -> (xs.length.toLong, xs.map(_._4).sum) }
    val exact = docs.filter(d => keep(d._1)).groupBy(_._2).map { case (s, xs) =>
      s -> (xs.length.toLong, xs.map(_._4).sum) }
    assert(out.length == base.size)
    out.foreach { r =>
      val src = r.getAs[String]("source")
      assert((r.getAs[Long]("n_docs"), r.getAs[Long]("tok_total")) == base(src))
      assert((r.getAs[Long]("n_exact"), r.getAs[Long]("tok_exact")) ==
        exact.getOrElse(src, (0L, 0L)), src)
      assert(r.getAs[Long]("n_neardup") <= r.getAs[Long]("n_exact"))
      assert(r.getAs[Long]("n_neardup") >= 0L)
      assert(r.getAs[Long]("tok_neardup") <= r.getAs[Long]("tok_exact"))
    }
  }

  test("q142 hybrid rrf: fusion matches a driver recombination of both legs") {
    val out = graft.ops.TextQueries.q142(spark, sfDir).collect()
    // both legs are already ordered (score desc, id) — rank = position
    val sparse = graft.ops.TextQueries.q112(spark, sfDir).collect()
      .map(_.getAs[Long]("doc_id")).zipWithIndex.map { case (id, i) => (id, i + 1L) }
    val dense = graft.operators.Similarity.q37(spark, sfDir).collect()
      .map(_.getAs[Long]("vec_id")).zipWithIndex.map { case (id, i) => (id, i + 1L) }
    val contribs = sparse.map { case (id, r) => (id, "bm25", r) } ++
      dense.map { case (id, r) => (id, "cos", r) }
    val expect = contribs.groupBy(_._1).map { case (id, xs) =>
      val rrf = math.round(xs.map(x => 1.0 / (60 + x._3)).sum * 1e6) / 1e6
      (id, xs.find(_._2 == "bm25").map(_._3), xs.find(_._2 == "cos").map(_._3), rrf)
    }.toSeq.sortBy { case (id, _, _, r) => (-r, id) }.take(10)
    assert(out.length == expect.length)
    out.zip(expect).foreach { case (r, (id, rb, rc, rrf)) =>
      assert(r.getAs[Long]("doc_id") == id)
      assert(Option(r.getAs[Any]("rank_bm25")).map(_.asInstanceOf[Long]) == rb)
      assert(Option(r.getAs[Any]("rank_cos")).map(_.asInstanceOf[Long]) == rc)
      assert(math.abs(r.getAs[Double]("rrf_score") - rrf) < 1e-12)
    }
  }

  test("q133 quality logit: integer fixed-point scores match a reimplementation") {
    val out = graft.ops.TextQueries.q133(spark, sfDir).collect()
    val docs = Tables.documents(spark, sfDir).selectExpr("source", "text")
      .collect().map { r =>
        val t = r.getString(1)
        def cnt(re: String) = re.r.findAllIn(t).length.toLong
        val logit = 20000L + 15L * cnt("[^\\t\\n\\f\\r ]+") +
          400L * cnt("\\b(the|a|of|and|to|in)\\b") - 250L * cnt("[.,!?;:]") -
          120L * cnt("[0-9]") - 600L * cnt("\\b[A-Z]{2,}\\b")
        val label = if (logit >= 40000L) "hi" else if (logit >= 20000L) "mid" else "lo"
        ((r.getString(0), label), logit)
      }
    val expect = docs.groupBy(_._1).map { case (k, xs) =>
      k -> (xs.length.toLong, xs.map(_._2).sum) }
    assert(out.length == expect.size)
    out.foreach { r =>
      val (n, s) = expect((r.getAs[String]("source"), r.getAs[String]("label")))
      assert(r.getAs[Long]("n_docs") == n)
      assert(r.getAs[Long]("sum_logit_1e4") == s)
      assert(math.abs(r.getAs[Double]("mean_logit_1e4") - s.toDouble / n) < 1e-9)
    }
  }
}
