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
    val allowEmpty = Set("q33_dedup_jaccard", "q34_dedup_minhash")
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
}
