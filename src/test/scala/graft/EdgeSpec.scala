package graft

import java.nio.file.Files

/** Edge hardening: every registered query must execute (not necessarily
  * return rows) against EMPTY inputs with the production schemas — the
  * shape of a fresh partition, a fully-filtered date slice, or a cold
  * bootstrap at scale. Catches empty-group division, min/max-on-empty,
  * and missing-broadcast-row crashes. */
class EdgeSpec extends SparkTestBase {

  private lazy val emptyDir: String = {
    val dir = Files.createTempDirectory("sf_empty").toString
    graft.sql.Views.tableNames.foreach { t =>
      val src =
        if (t == "events") Tables.events(spark, sfDir)
        else Tables.table(spark, sfDir, t)
      src.limit(0).write.mode("overwrite").parquet(s"$dir/$t.parquet")
    }
    dir
  }

  test("all queries execute on empty fixtures without throwing") {
    val failures = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        try { fn(spark, emptyDir).count(); None }
        catch { case e: Throwable => Some(s"$name: ${e.getMessage.take(150)}") }
    }
    assert(failures.isEmpty, failures.mkString("\n"))
  }

  // The next cold-bootstrap shape after empty: ONE row per table. This is
  // where k-greater-than-n training edges live (the twin Lloyd's sub-K
  // crash was exactly this class) — learned-state operators must degrade
  // to fewer centroids/probes, not index past what the corpus provides.
  private lazy val oneRowDir: String = {
    val dir = Files.createTempDirectory("sf_one").toString
    graft.sql.Views.tableNames.foreach { t =>
      val src =
        if (t == "events") Tables.events(spark, sfDir)
        else Tables.table(spark, sfDir, t)
      src.limit(1).write.mode("overwrite").parquet(s"$dir/$t.parquet")
    }
    dir
  }

  test("all queries execute on 1-row fixtures without throwing") {
    val failures = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        try { fn(spark, oneRowDir).count(); None }
        catch { case e: Throwable => Some(s"$name: ${e.getMessage.take(150)}") }
    }
    assert(failures.isEmpty, failures.mkString("\n"))
  }

  // The realistic 100 TB hazard: heavily DUPLICATED data. Every pairwise
  // operator (shingle joins, band buckets, CC) faces k² blowup on a clone
  // group unless it contracts identical payloads first — the repo-wide
  // collapse discipline (Dedup.textGroups, SRP clone-collapse). 40 unique
  // docs/vectors × 25 clones each; non-doc tables copied verbatim.
  private lazy val cloneDir: String = {
    import org.apache.spark.sql.functions._
    val dir = Files.createTempDirectory("sf_clone").toString
    val mult = spark.range(25).select(col("id").as("_c"))
    graft.sql.Views.tableNames.foreach { t =>
      val src =
        if (t == "events") Tables.events(spark, sfDir)
        else Tables.table(spark, sfDir, t)
      val out = t match {
        case "documents" =>
          src.orderBy(col("doc_id")).limit(40).crossJoin(mult)
            .withColumn("doc_id", col("doc_id") * 1000L + col("_c"))
            .drop("_c")
        case "embeddings" =>
          src.orderBy(col("vec_id")).limit(40).crossJoin(mult)
            .withColumn("vec_id", col("vec_id") * 1000L + col("_c"))
            .drop("_c")
        case _ => src
      }
      out.write.mode("overwrite").parquet(s"$dir/$t.parquet")
    }
    dir
  }

  test("clone-heavy fixture: pairwise/banding/clustering queries complete") {
    // the pairwise-hazard families: exact/shingle/banded dedup, graph CC,
    // embedding near-dup — each must survive 25-way cloning of every doc
    val subset = Seq(
      "q32_dedup_exact", "q33_dedup_jaccard", "q34_dedup_minhash",
      "q35_simhash", "q36_embedding_neardup", "q42_winnowing",
      "q49_neardup_lsh", "q54_trigram_jaccard", "q59_norm_dedup",
      "q67_neardup_clusters", "q69_chunk_dedup", "q124_segment_dedup",
      "q129_semdedup", "q147_doc_ledger", "q176_crossmodal_dedup")
    val failures = subset.flatMap { name =>
      try { SparkEntry.queries(name)(spark, cloneDir).count(); None }
      catch { case e: Throwable => Some(s"$name: ${e.getMessage.take(150)}") }
    }
    assert(failures.isEmpty, failures.mkString("\n"))
  }

  test("clone-heavy fixture: textGroups contracts to one rep per unique text") {
    import org.apache.spark.sql.functions._
    val docs = Tables.table(spark, cloneDir, "documents")
    val groups = graft.operators.Dedup.textGroups(docs, "text", "doc_id")
    val rows = groups.select(col("rep"), col("members")).collect()
    assert(rows.length == 40, s"expected 40 unique-text groups, got ${rows.length}")
    rows.foreach { r =>
      val members = r.getSeq[Long](1)
      assert(members.length == 25, s"group of ${members.length}, expected 25 clones")
      assert(r.getLong(0) == members.min, "rep must be the min-id member")
    }
  }

  test("paging on an empty filtered set returns an empty page, no cursor") {
    val p = graft.ops.Paging.page(
      Tables.orders(spark, emptyDir), "o_orderdate", "o_orderkey", None, 10)
    assert(p.rows.isEmpty && p.total == 0 && p.nextCursor.isEmpty)
  }

  // Java's \s matches vertical tab (\x0B); RE2's (DuckDB's regex engine)
  // does not. Every token-count/tokenize site therefore uses the explicit
  // class [\t\n\f\r ] — this pins the RE2 semantics on the one codepoint
  // where the engines disagree: "a\x0Bb" is ONE token, not two.
  test("vertical-tab doc: token counting matches RE2, not Java \\s") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val doc = "a\u000Bb c\td\ne"
    val df = Seq(doc).toDF("text")
    // RE2 '\S+' over the doc: ["a\x0Bb", "c", "d", "e"] → 4 tokens
    val nTok = df.select(
      regexp_count(col("text"), lit("[^\\t\\n\\f\\r ]+")).cast("long"))
      .head.getLong(0)
    assert(nTok == 4L, s"expected 4 RE2 tokens, got $nTok")
    val toks = df.select(graft.ops.TextQueries.tokens(col("text")))
      .head.getSeq[String](0)
    assert(toks == Seq("a\u000Bb", "c", "d", "e"), toks.toString)
    // subtoken pattern: \x0B is a non-alnum symbol in BOTH engines now
    val nSub = df.select(
      regexp_count(col("text"), lit(graft.ops.TextQueries.SubtokenPattern))
        .cast("long")).head.getLong(0)
    assert(nSub == 6L, s"expected 6 subtokens (5 letters + \\x0B), got $nSub")
    // the native generator tokenizes with the same class
    val grams = df.select(
      org.apache.spark.sql.graft.WordNGrams.column(col("text"), 1))
      .collect().map(_.getString(0)).toSeq
    assert(grams == Seq("a\u000Bb", "c", "d", "e"), grams.toString)
  }

  // An EMPTY eval/reference set must PASS every vector (NULL max_cos,
  // quarantined = 0) — the oracle's LEFT JOIN shape. evalSet is a global
  // collect_list aggregate, so it yields one row with an empty array (not
  // zero rows), and the constant-key join keeps every vector alive.
  test("empty eval set: decontamination gate passes all vectors") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val vectors = Seq(
      (1L, Array(1.0f, 0.0f)), (2L, Array(0.0f, 1.0f))
    ).toDF("vec_id", "embedding")
    val evals = graft.streaming.VectorStream.evalSet(spark, emptyDir)
    assert(evals.count() == 1L, "evalSet must be a 1-row aggregate even when empty")
    val out = graft.streaming.VectorStream.screen(vectors, evals)
      .orderBy(col("vec_id")).collect()
    assert(out.length == 2, s"every vector must survive; got ${out.length}")
    assert(out.forall(r => r.isNullAt(r.fieldIndex("max_cos"))),
      "empty reference set → NULL max_cos")
    assert(out.forall(_.getLong(2) == 0L), "empty reference set → nothing quarantined")
  }
}
