package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.OperatorCaches.TrackedDataset
import graft.Tables._

/** Corpus-curation operators (round 7): the Gopher-style hard-rule quality
  * battery, per-domain document caps, tokenizer-fertility accounting, and
  * sketch-mergeable distinct counts — the four remaining curation moves a
  * training-data pipeline runs between raw crawl and mixture building
  * (reference analog: the keep/drop cleaning loop in
  * scripts/data_cleaning.py:31-63, generalized to corpus scale).
  *
  * All batch rules are pure integer Catalyst expressions (regexp_count +
  * integer division) so every ratio is bit-identical in DuckDB; nothing
  * here shuffles more than one aggregate exchange except the capped
  * selection, which uses the bounded-heap TopKPerKey operator instead of a
  * Window sort.
  */
object Curation {

  // ── q149: Gopher-style HARD-RULE battery — unlike q45 (weighted blend
  //         score) and q133 (single logit), production corpus filters are
  //         conjunctions of named pass/fail rules, and what the pipeline
  //         owner reads is the per-source kill breakdown: which rule
  //         removed how many documents, and what survives all of them.
  //         Rules (integer arithmetic only, ratios as cross-multiplied
  //         comparisons so no floats exist anywhere):
  //           r_nwords: 50 ≤ word count ≤ 100 000
  //           r_mwl:    mean word length in [3.00, 10.00] chars
  //           r_sym:    symbol-to-word ratio ≤ 1/10
  //           r_digit:  digit-to-char ratio ≤ 1/5
  //           r_caps:   ALL-CAPS-word-to-word ratio ≤ 1/10
  //           r_stop:   ≥ 2 stopword hits
  //         One corpus pass, one 20-row-out aggregate exchange — the
  //         cheapest possible 100 TB shape (same as q145).
  def q149(s: SparkSession, dir: String): DataFrame = {
    // all six counts from ONE TextStatsExpr byte scan instead of six
    // regexp_count traversals — the 26.9s-at-100× floor of this query
    // was the regex passes themselves (fixture-identical; \b follows the
    // oracle's RE2 semantics, see the kernel's scaladoc)
    val m = documents(s, dir)
      .withColumn("_ts",
        org.apache.spark.sql.graft.TextStatsExpr.column(col("text")))
      .select(
        col("source"), col("n_chars"),
        element_at(col("_ts"), 1).as("n_words"),
        element_at(col("_ts"), 2).as("n_nonspace"),
        element_at(col("_ts"), 3).as("n_sym"),
        element_at(col("_ts"), 4).as("n_digit"),
        element_at(col("_ts"), 5).as("n_caps"),
        element_at(col("_ts"), 6).as("n_stop"))
    val r = m.select(
      col("source"), col("n_words"),
      (col("n_words") >= 50L && col("n_words") <= 100000L).as("r_nwords"),
      expr("n_nonspace * 100 DIV greatest(n_words, 1) BETWEEN 300 AND 1000")
        .as("r_mwl"),
      (col("n_sym") * 10L <= col("n_words")).as("r_sym"),
      (col("n_digit") * 5L <= col("n_chars")).as("r_digit"),
      (col("n_caps") * 10L <= col("n_words")).as("r_caps"),
      (col("n_stop") >= 2L).as("r_stop"))
    val kept = col("r_nwords") && col("r_mwl") && col("r_sym") &&
      col("r_digit") && col("r_caps") && col("r_stop")
    r.groupBy(col("source"))
      .agg(
        count(lit(1)).as("n_docs"),
        count(when(!col("r_nwords"), 1)).as("fail_nwords"),
        count(when(!col("r_mwl"), 1)).as("fail_mwl"),
        count(when(!col("r_sym"), 1)).as("fail_sym"),
        count(when(!col("r_digit"), 1)).as("fail_digit"),
        count(when(!col("r_caps"), 1)).as("fail_caps"),
        count(when(!col("r_stop"), 1)).as("fail_stop"),
        count(when(kept, 1)).as("n_kept"),
        sum(when(kept, col("n_words")).otherwise(0L)).as("kept_words"))
      .orderBy(col("source"))
  }

  val q149Sql: String =
    """WITH m AS (
      |  SELECT source, n_chars,
      |    len(regexp_extract_all(text, '\S+')) AS n_words,
      |    len(regexp_extract_all(text, '\S')) AS n_nonspace,
      |    len(regexp_extract_all(text, '[#@%^*_~|]')) AS n_sym,
      |    len(regexp_extract_all(text, '[0-9]')) AS n_digit,
      |    len(regexp_extract_all(text, '\b[A-Z]{2,}\b')) AS n_caps,
      |    len(regexp_extract_all(text, '\b(the|a|of|and|to|in)\b')) AS n_stop
      |  FROM documents),
      |r AS (
      |  SELECT source, n_words,
      |    (n_words BETWEEN 50 AND 100000) AS r_nwords,
      |    (n_nonspace * 100 // greatest(n_words, 1) BETWEEN 300 AND 1000) AS r_mwl,
      |    (n_sym * 10 <= n_words) AS r_sym,
      |    (n_digit * 5 <= n_chars) AS r_digit,
      |    (n_caps * 10 <= n_words) AS r_caps,
      |    (n_stop >= 2) AS r_stop
      |  FROM m)
      |SELECT source, count(*) AS n_docs,
      |  count(*) FILTER (WHERE NOT r_nwords) AS fail_nwords,
      |  count(*) FILTER (WHERE NOT r_mwl) AS fail_mwl,
      |  count(*) FILTER (WHERE NOT r_sym) AS fail_sym,
      |  count(*) FILTER (WHERE NOT r_digit) AS fail_digit,
      |  count(*) FILTER (WHERE NOT r_caps) AS fail_caps,
      |  count(*) FILTER (WHERE NOT r_stop) AS fail_stop,
      |  count(*) FILTER (WHERE r_nwords AND r_mwl AND r_sym AND r_digit
      |                     AND r_caps AND r_stop) AS n_kept,
      |  CAST(sum(CASE WHEN r_nwords AND r_mwl AND r_sym AND r_digit
      |                 AND r_caps AND r_stop THEN n_words ELSE 0 END)
      |       AS BIGINT) AS kept_words
      |FROM r GROUP BY source ORDER BY source""".stripMargin

  // ── q150: per-domain document cap — CommonCrawl-style domain balancing:
  //         no single source may contribute more than K documents, and the
  //         K survivors are the BEST K by the shared quality logit
  //         (doc_id tiebreak). Runs on the bounded-heap TopKPerKey
  //         operator: one hash exchange, O(sources·K) state, no Window
  //         sort — at 100 TB the difference between heap-scanning the
  //         corpus and sorting every domain's full history. Oracled by the
  //         equivalent row_number window SQL.
  def q150(s: SparkSession, dir: String): DataFrame = {
    val scored = documents(s, dir).select(
      col("source"), col("doc_id"),
      graft.ops.TextQueries.qualityLogit(col("text")).as("q"))
    org.apache.spark.sql.graft.TopKPerKey.of(scored,
        keys = Seq("source"), orderBy = Seq("q" -> false, "doc_id" -> true),
        k = 10)
      .orderBy(col("source"), desc("q"), col("doc_id"))
  }

  val q150Sql: String =
    """SELECT source, doc_id, q FROM (
      |  SELECT source, doc_id,
      |    20000 + 15*len(regexp_extract_all(text, '\S+'))
      |      + 400*len(regexp_extract_all(text, '\b(the|a|of|and|to|in)\b'))
      |      - 250*len(regexp_extract_all(text, '[.,!?;:]'))
      |      - 120*len(regexp_extract_all(text, '[0-9]'))
      |      - 600*len(regexp_extract_all(text, '\b[A-Z]{2,}\b')) AS q,
      |    row_number() OVER (PARTITION BY source
      |      ORDER BY 20000 + 15*len(regexp_extract_all(text, '\S+'))
      |        + 400*len(regexp_extract_all(text, '\b(the|a|of|and|to|in)\b'))
      |        - 250*len(regexp_extract_all(text, '[.,!?;:]'))
      |        - 120*len(regexp_extract_all(text, '[0-9]'))
      |        - 600*len(regexp_extract_all(text, '\b[A-Z]{2,}\b')) DESC,
      |        doc_id) AS rn
      |  FROM documents) t
      |WHERE rn <= 10 ORDER BY source, q DESC, doc_id""".stripMargin

  // ── q151: tokenizer-fertility accounting — subtokens-per-word and
  //         chars-per-subtoken per (lang, source), the number a tokenizer
  //         owner tracks per corpus slice (high fertility = the tokenizer
  //         fragments that slice; drives both token-budget math and
  //         tokenizer retraining). Exact integer sums + integer-scaled
  //         divisions; one aggregate exchange, 100 rows out.
  def q151(s: SparkSession, dir: String): DataFrame =
    documents(s, dir)
      .withColumn("_ts",
        org.apache.spark.sql.graft.TextStatsExpr.column(col("text")))
      .select(col("lang"), col("source"), col("n_chars"),
        element_at(col("_ts"), 1).as("n_words"),
        element_at(col("_ts"), 8).as("n_subtok"))
      .groupBy(col("lang"), col("source"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_words")).as("tot_words"),
        sum(col("n_subtok")).as("tot_subtok"),
        sum(col("n_chars")).as("tot_chars"))
      .select(col("lang"), col("source"), col("n_docs"),
        col("tot_words"), col("tot_subtok"), col("tot_chars"),
        expr("tot_subtok * 1000 DIV greatest(tot_words, 1)").as("fert_x1000"),
        expr("tot_chars * 1000 DIV greatest(tot_subtok, 1)").as("cps_x1000"))
      .orderBy(col("lang"), col("source"))

  val q151Sql: String =
    """WITH m AS (
      |  SELECT lang, source, n_chars,
      |    len(regexp_extract_all(text, '\S+')) AS n_words,
      |    len(regexp_extract_all(text, '[A-Za-z0-9]{1,4}|[^A-Za-z0-9\s]')) AS n_subtok
      |  FROM documents),
      |a AS (
      |  SELECT lang, source, count(*) AS n_docs,
      |    CAST(sum(n_words) AS BIGINT) AS tot_words,
      |    CAST(sum(n_subtok) AS BIGINT) AS tot_subtok,
      |    CAST(sum(n_chars) AS BIGINT) AS tot_chars
      |  FROM m GROUP BY lang, source)
      |SELECT lang, source, n_docs, tot_words, tot_subtok, tot_chars,
      |  tot_subtok * 1000 // greatest(tot_words, 1) AS fert_x1000,
      |  tot_chars * 1000 // greatest(tot_subtok, 1) AS cps_x1000
      |FROM a ORDER BY lang, source""".stripMargin

  // ── q152: sketch-mergeable distinct users — the incremental-distinct
  //         shape at 100 TB: per (event_type, day) HLL register relations
  //         built in one pass (bucket/rank from the production xxhash64,
  //         max partial-aggregated map-side), then MERGED per event_type
  //         with a second max — without re-touching the raw events.
  //         Exactly how a warehouse maintains daily sketch rollups and
  //         answers "distinct users this month" by union, not recount.
  //         Output carries the estimate next to the exact distinct so the
  //         dump shows the error. Sketches are graft.ops.Rhll registers —
  //         plain rows, not opaque Datasketches bytes — so the DuckDB
  //         oracle replays the whole pipeline hash-exactly
  //         (Xxh64Sql.longHashCtes → HllSql); CurationSpec additionally
  //         pins the ±5% envelope against the exact side.
  def q152(s: SparkSession, dir: String): DataFrame = {
    val ev = events(s, dir)
      .select(col("event_type"), to_date(col("ts")).as("day"), col("user_id"))
    // NULL user_id must not sketch: Spark xxhash64(NULL) hashes to the
    // seed (a phantom distinct) while the oracle's equi-join on the
    // hashed-key relation drops NULL rows — filter matches the join.
    val hashed = ev.filter(col("user_id").isNotNull)
      .select(col("event_type"), col("day"),
        xxhash64(col("user_id")).as("h"))
    val daily = hashed
      .select(col("event_type"), col("day"),
        Rhll.bucket(col("h")).as("bucket"), Rhll.rank(col("h")).as("r0"))
      .groupBy(col("event_type"), col("day"), col("bucket"))
      .agg(max(col("r0")).as("r"))
    val merged = daily.groupBy(col("event_type"), col("bucket"))
      .agg(max(col("r")).as("r"))
    val est = Rhll.estimate(merged, Seq("event_type"), 52, "est_users")
    val meta = ev.groupBy(col("event_type"))
      .agg(countDistinct(col("day")).as("n_days"),
        countDistinct(col("user_id")).as("exact_users"))
    meta.join(est, Seq("event_type"))
      .select(col("event_type"), col("n_days"), col("est_users"),
        col("exact_users"))
      .orderBy(col("event_type"))
  }

  val q152Sql: String = {
    val hash = graft.sql.Xxh64Sql.longHashCtes(
      "SELECT DISTINCT user_id AS k FROM events")
    val sketch = graft.sql.HllSql.sketchCtes("hll",
      "SELECT e.event_type, xl5.ux AS u FROM events e JOIN xl5 ON e.user_id = xl5.k",
      Seq("event_type"), 52, "est_users")
    s"""WITH $hash,
       |${graft.sql.HllSql.lcCte},
       |$sketch,
       |meta AS (
       |  SELECT event_type, count(DISTINCT CAST(ts AS DATE)) AS n_days,
       |    count(DISTINCT user_id) AS exact_users
       |  FROM events GROUP BY event_type)
       |SELECT m.event_type, m.n_days, h.est_users, m.exact_users
       |FROM meta m JOIN hll h USING (event_type)
       |ORDER BY event_type""".stripMargin
  }

  // ── q153: PERSISTED sketch ledger — q152's incremental production form:
  //         daily HLL register relations are WRITTEN to parquet (plain
  //         (type, day, bucket, r) rows) as the ledger, and the newest day
  //         arrives later as a batch whose registers are max-merged against
  //         the ledger READ BACK from disk — distinct-users-to-date updated
  //         per day without ever re-touching historical raw events (the
  //         q82/q148 ledger discipline, approximate-state edition). At
  //         100 TB the ledger is (types × days × ≤4096) tiny rows —
  //         kilobytes per day — while the raw events it summarizes never
  //         need to exist again. Registers are Rhll rows, so the DuckDB
  //         oracle replays both the before- and after-merge estimates
  //         hash-exactly; CurationSpec pins union-through-parquet ≡ one
  //         global sketch over all events.
  def q153(s: SparkSession, dir: String): DataFrame = {
    val ev = events(s, dir)
      .select(col("event_type"), to_date(col("ts")).as("day"), col("user_id"))
    // the deterministic "today": a 1-row bounded collect, never data-sized
    val maxRow = ev.agg(max(col("day"))).collect()(0)
    if (maxRow.isNullAt(0)) {
      // empty source → empty ledger report, correct schema
      import org.apache.spark.sql.types._
      return s.createDataFrame(
        java.util.Collections.emptyList[org.apache.spark.sql.Row](),
        StructType(Seq(StructField("event_type", StringType),
          StructField("n_days_ledger", LongType),
          StructField("est_before", DoubleType),
          StructField("est_after", DoubleType))))
    }
    val maxDay = maxRow.getDate(0)
    def regs(rows: DataFrame): DataFrame = rows
      .filter(col("user_id").isNotNull) // q152's NULL-vs-seed parity guard
      .select(col("event_type"), col("day"),
        xxhash64(col("user_id")).as("h"))
      .select(col("event_type"), col("day"),
        Rhll.bucket(col("h")).as("bucket"), Rhll.rank(col("h")).as("r0"))
      .groupBy(col("event_type"), col("day"), col("bucket"))
      .agg(max(col("r0")).as("r"))
    val ledgerDir = graft.Fixtures.path("hllledger", dir)(
      regs(ev.filter(col("day") < lit(maxDay))))
    val ledger = s.read.parquet(ledgerDir)
    val batch = regs(ev.filter(col("day") === lit(maxDay)))
    val before = Rhll.estimate(
        ledger.groupBy(col("event_type"), col("bucket")).agg(max(col("r")).as("r")),
        Seq("event_type"), 52, "est_before")
      .join(ledger.groupBy(col("event_type"))
        .agg(countDistinct(col("day")).as("n_days_ledger")), Seq("event_type"))
    val after = Rhll.estimate(
      ledger.unionByName(batch)
        .groupBy(col("event_type"), col("bucket")).agg(max(col("r")).as("r")),
      Seq("event_type"), 52, "est_after")
    before.join(after, Seq("event_type"))
      .select(col("event_type"), col("n_days_ledger"), col("est_before"),
        col("est_after"))
      .orderBy(col("event_type"))
  }

  val q153Sql: String = {
    val hash = graft.sql.Xxh64Sql.longHashCtes(
      "SELECT DISTINCT user_id AS k FROM events")
    val before = graft.sql.HllSql.sketchCtes("bh",
      "SELECT event_type, u FROM ue WHERE day < (SELECT maxday FROM mx)",
      Seq("event_type"), 52, "est_before")
    val after = graft.sql.HllSql.sketchCtes("ah",
      "SELECT event_type, u FROM ue",
      Seq("event_type"), 52, "est_after")
    s"""WITH $hash,
       |${graft.sql.HllSql.lcCte},
       |mx AS (SELECT max(CAST(ts AS DATE)) AS maxday FROM events),
       |ue AS (
       |  SELECT e.event_type, CAST(e.ts AS DATE) AS day, xl5.ux AS u
       |  FROM events e JOIN xl5 ON e.user_id = xl5.k),
       |$before,
       |$after,
       |meta AS (
       |  SELECT event_type, count(DISTINCT day) AS n_days_ledger
       |  FROM ue WHERE day < (SELECT maxday FROM mx) GROUP BY event_type)
       |SELECT m.event_type, m.n_days_ledger, b.est_before, a.est_after
       |FROM meta m JOIN bh b USING (event_type) JOIN ah a USING (event_type)
       |ORDER BY event_type""".stripMargin
  }

  // ── q154: sketch-based source-overlap matrix — the 100 TB path for
  //         q72's exact overlap audit (whose pairwise gram join is
  //         documented audit-only): each source's distinct-document set is
  //         summarized ONCE into an HLL register relation of 60-bit text
  //         digests (md5 prefix — replayable in DuckDB, unlike xxhash64
  //         over arbitrary-length text), and every source pair is then
  //         estimated from the ≤4096-row sketches via inclusion–exclusion
  //         (|A∩B| = |A|+|B|−|A∪B|) with the union as a per-pair register
  //         max-merge — the corpus is scanned exactly once however many
  //         sources exist, and the pair matrix never touches raw data.
  //         Oracle-exact via HllSql; CurationSpec additionally pins the
  //         estimates against the exact digest-intersection.
  def q154(s: SparkSession, dir: String): DataFrame = {
    // 60-bit digest: md5 hex prefix, identical in DuckDB via '0x' cast;
    // bucket = top 12 bits → rank over the remaining 48
    val fp = expr(
      "CAST(conv(substring(md5(text), 1, 15), 16, 10) AS BIGINT)")
    // persisted: perSrc, srcs, and BOTH pairRegs legs consume this — the
    // one corpus scan must run once, not once per consumer (the
    // winnowingShaPairs exchange-reuse failure mode)
    val regs = documents(s, dir)
      .select(col("source"), fp.as("fp"))
      .select(col("source"), Rhll.bucket(col("fp"), 48).as("bucket"),
        Rhll.rank(col("fp"), 48).as("r0"))
      .groupBy(col("source"), col("bucket"))
      .agg(max(col("r0")).as("r"))
      .trackedPersist()
    val perSrc = Rhll.estimate(regs, Seq("source"), 48, "est")
    // sources number in the dozens: the pair frame broadcasts; pair
    // registers are |pairs| × ≤4096 rows, never corpus-sized
    val srcs = regs.select(col("source")).distinct()
    val pairs = srcs.select(col("source").as("src_a"))
      .join(srcs.select(col("source").as("src_b")),
        col("src_a") < col("src_b"))
    val pairRegs = broadcast(pairs)
      .join(regs.withColumnRenamed("source", "src_a"), Seq("src_a"))
      .unionByName(broadcast(pairs)
        .join(regs.withColumnRenamed("source", "src_b"), Seq("src_b"))
        .select(col("src_a"), col("src_b"), col("bucket"), col("r")))
      .select(col("src_a"), col("src_b"), col("bucket"), col("r"))
      .groupBy(col("src_a"), col("src_b"), col("bucket"))
      .agg(max(col("r")).as("r"))
    val union = Rhll.estimate(pairRegs, Seq("src_a", "src_b"), 48, "est_union")
    union
      .join(broadcast(perSrc.select(col("source").as("src_a"),
        col("est").as("est_a"))), Seq("src_a"))
      .join(broadcast(perSrc.select(col("source").as("src_b"),
        col("est").as("est_b"))), Seq("src_b"))
      .select(col("src_a"), col("src_b"), col("est_a"), col("est_b"),
        col("est_union"),
        greatest(round((col("est_a") + col("est_b") - col("est_union"))
          * 10000) / 10000.0, lit(0.0)).as("est_inter"))
      .orderBy(col("src_a"), col("src_b"))
  }

  val q154Sql: String = {
    val perSrc = graft.sql.HllSql.sketchCtes("se",
      "SELECT source, CAST(concat('0x', substring(md5(text), 1, 15)) AS BIGINT) AS u FROM documents",
      Seq("source"), 48, "est")
    val pairEst = graft.sql.HllSql.estimateCtes("pe", "pregs",
      Seq("src_a", "src_b"), 48, "est_union")
    s"""WITH ${graft.sql.HllSql.lcCte},
       |$perSrc,
       |srcs AS (SELECT DISTINCT source FROM documents),
       |pairs AS (
       |  SELECT a.source AS src_a, b.source AS src_b
       |  FROM srcs a JOIN srcs b ON a.source < b.source),
       |pregs0 AS (
       |  SELECT p.src_a, p.src_b, r.bucket, r.r
       |  FROM pairs p JOIN se_regs r ON r.source = p.src_a
       |  UNION ALL
       |  SELECT p.src_a, p.src_b, r.bucket, r.r
       |  FROM pairs p JOIN se_regs r ON r.source = p.src_b),
       |pregs AS (
       |  SELECT src_a, src_b, bucket, max(r) AS r
       |  FROM pregs0 GROUP BY src_a, src_b, bucket),
       |$pairEst
       |SELECT p.src_a, p.src_b, ea.est AS est_a, eb.est AS est_b,
       |  pu.est_union,
       |  greatest(round((ea.est + eb.est - pu.est_union) * 10000) / 10000.0,
       |    0.0) AS est_inter
       |FROM pairs p
       |JOIN se ea ON ea.source = p.src_a
       |JOIN se eb ON eb.source = p.src_b
       |JOIN pe pu ON pu.src_a = p.src_a AND pu.src_b = p.src_b
       |ORDER BY p.src_a, p.src_b""".stripMargin
  }

  // ── q159: blocklist filtering via JOIN, not regex — content filtering
  //         against a large term list. A single alternation regex stops
  //         scaling past a few hundred terms (pattern compilation and
  //         per-char backtracking); the production shape is relational:
  //         tokenize once, equi-join the token stream against the
  //         broadcast blocklist, aggregate hits per document. The
  //         blocklist here is itself derived deterministically (the 40
  //         alphabetically-first distinct corpus tokens of length ≥ 5 —
  //         a stand-in for the curated list a real pipeline ships), so
  //         the whole query is SQL-expressible and the oracle is
  //         bit-exact. Per-doc output: distinct blocked terms, total
  //         hits, verdict at the ≥3-distinct-terms cut.
  def q159(s: SparkSession, dir: String): DataFrame = {
    val toks = documents(s, dir)
      .select(col("doc_id"), col("source"),
        explode(graft.ops.TextQueries.tokens(col("text"))).as("tok"))
    val blocklist = toks.select(col("tok"))
      .filter(length(col("tok")) >= 5).distinct()
      .orderBy(col("tok")).limit(40)
    val hits = toks.join(broadcast(blocklist), Seq("tok"))
      .groupBy(col("doc_id"), col("source"))
      .agg(countDistinct(col("tok")).as("n_terms"),
        count(lit(1)).as("n_hits"))
    hits.select(col("doc_id"), col("source"), col("n_terms"), col("n_hits"),
        when(col("n_terms") >= 3, "block").otherwise("flag").as("verdict"))
      .orderBy(col("doc_id"))
  }

  val q159Sql: String =
    """WITH toks AS (
      |  SELECT doc_id, source, unnest(regexp_extract_all(text, '\S+')) AS tok
      |  FROM documents),
      |bl AS (
      |  SELECT DISTINCT tok FROM toks WHERE len(tok) >= 5
      |  ORDER BY tok LIMIT 40),
      |h AS (
      |  SELECT doc_id, source, count(DISTINCT t.tok) AS n_terms,
      |    count(*) AS n_hits
      |  FROM toks t JOIN bl USING (tok)
      |  GROUP BY doc_id, source)
      |SELECT doc_id, source, n_terms, n_hits,
      |  CASE WHEN n_terms >= 3 THEN 'block' ELSE 'flag' END AS verdict
      |FROM h ORDER BY doc_id""".stripMargin

  // ── q162: erasure audit (GDPR/right-to-be-forgotten) — the governance
  //         operator every stored corpus eventually needs: a tombstone
  //         table of user ids to erase (here derived deterministically:
  //         user_id % 97 == 0), an anti-join producing the surviving
  //         table, and the PROOF report regulators ask for — per
  //         event_type: rows before, rows erased, rows after, distinct
  //         erased users — with after + erased ≡ before enforced by the
  //         oracle hash. Scale shape: the tombstone side broadcasts (it
  //         is always small relative to the corpus); one corpus pass
  //         computes both sides of the proof via conditional aggregation
  //         — no second scan of the survivors.
  def q162(s: SparkSession, dir: String): DataFrame = {
    val flagged = events(s, dir)
      .withColumn("erase", col("user_id") % 97 === 0)
    flagged.groupBy(col("event_type"))
      .agg(
        count(lit(1)).as("rows_before"),
        count(when(col("erase"), 1)).as("rows_erased"),
        count(when(!col("erase"), 1)).as("rows_after"),
        countDistinct(when(col("erase"), col("user_id"))).as("users_erased"))
      .orderBy(col("event_type"))
  }

  val q162Sql: String =
    """SELECT event_type,
      |  count(*) AS rows_before,
      |  count(*) FILTER (WHERE user_id % 97 = 0) AS rows_erased,
      |  count(*) FILTER (WHERE user_id % 97 <> 0) AS rows_after,
      |  count(DISTINCT CASE WHEN user_id % 97 = 0 THEN user_id END)
      |    AS users_erased
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin

  // ── q163: weighted sampling WITHOUT replacement via priority sampling
  //         (Duffield–Lund–Thorup): each doc draws a deterministic uniform
  //         u from md5(doc_id) and gets priority = w·2³² DIV u with
  //         w = token count — heavier documents sample with higher
  //         probability, and the k largest priorities form the sample.
  //         All-integer arithmetic (u from an 8-hex-digit slice, priority
  //         by integer division, w·2³² ≤ 4.3·10¹⁴ « int64), so both
  //         engines compute bit-identical keys and the oracle is exact —
  //         no float ordering anywhere. One corpus pass + top-k
  //         (TakeOrderedAndProject): the one-shuffle-free distributed
  //         weighted-sample shape, vs. the usual sort-everything.
  def q163(s: SparkSession, dir: String): DataFrame =
    documents(s, dir)
      .select(col("doc_id"), col("source"),
        greatest(element_at(org.apache.spark.sql.graft.TextStatsExpr.column(col("text")), 1), lit(1L))
          .as("w"),
        expr("CAST(conv(substring(md5(CAST(doc_id AS STRING)), 1, 8), 16, 10)" +
          " AS BIGINT) + 1").as("u"))
      .withColumn("priority", expr("w * 4294967296 DIV u"))
      .select(col("doc_id"), col("source"), col("w"), col("priority"))
      .orderBy(desc("priority"), col("doc_id"))
      .limit(100)

  val q163Sql: String =
    """WITH m AS (
      |  SELECT doc_id, source,
      |    greatest(len(regexp_extract_all(text, '\S+')), 1) AS w,
      |    CAST(concat('0x', substring(md5(CAST(doc_id AS VARCHAR)), 1, 8))
      |         AS BIGINT) + 1 AS u
      |  FROM documents)
      |SELECT doc_id, source, w, w * 4294967296 // u AS priority
      |FROM m ORDER BY priority DESC, doc_id LIMIT 100""".stripMargin

  // ── q164: PER-SOURCE weighted sampling — q163's integer-exact
  //         priorities routed through the bounded-heap TopKPerKey
  //         operator: a k=5 weighted sample per source in one hash
  //         exchange with O(sources·k) state, no Window, no per-group
  //         sort. The composition is the point: the sampling key and the
  //         grouped-top-k engine are orthogonal pieces, and the oracle is
  //         the row_number window SQL over the same integer priority.
  def q164(s: SparkSession, dir: String): DataFrame = {
    val scored = documents(s, dir)
      .select(col("doc_id"), col("source"),
        greatest(element_at(org.apache.spark.sql.graft.TextStatsExpr.column(col("text")), 1), lit(1L))
          .as("w"),
        expr("CAST(conv(substring(md5(CAST(doc_id AS STRING)), 1, 8), 16, 10)" +
          " AS BIGINT) + 1").as("u"))
      .withColumn("priority", expr("w * 4294967296 DIV u"))
      .select(col("source"), col("doc_id"), col("w"), col("priority"))
    org.apache.spark.sql.graft.TopKPerKey.of(scored,
        keys = Seq("source"),
        orderBy = Seq("priority" -> false, "doc_id" -> true), k = 5)
      .orderBy(col("source"), desc("priority"), col("doc_id"))
  }

  val q164Sql: String =
    """WITH m AS (
      |  SELECT source, doc_id,
      |    greatest(len(regexp_extract_all(text, '\S+')), 1) AS w,
      |    CAST(concat('0x', substring(md5(CAST(doc_id AS VARCHAR)), 1, 8))
      |         AS BIGINT) + 1 AS u
      |  FROM documents),
      |p AS (
      |  SELECT source, doc_id, w, w * 4294967296 // u AS priority,
      |    row_number() OVER (PARTITION BY source
      |      ORDER BY w * 4294967296 // u DESC, doc_id) AS rn
      |  FROM m)
      |SELECT source, doc_id, w, priority
      |FROM p WHERE rn <= 5 ORDER BY source, priority DESC, doc_id""".stripMargin

  // ── q193: Gopher REPETITION signals — the other half of the Rae et al.
  //         2021 Table A1 filter battery that q149's hard rules leave out:
  //         INTRA-document repetition. Per doc, over word n-grams:
  //           top-{2,3,4}-gram char coverage  = max over grams of
  //             count × gram_chars. DELIBERATE DEVIATION from the paper's
  //             "fraction of characters in the MOST FREQUENT n-gram": the
  //             max is over the count×chars PRODUCT, so a longer-but-
  //             rarer gram can win over the most frequent one — i.e. the
  //             rule is the stricter "largest char coverage by any single
  //             gram" (≥ the paper's value, monotone in repetition, and a
  //             closed form with no frequency-tie rule to pin). Engine
  //             and oracle compute the same deviation — like the
  //             dup-coverage no-overlap note below.
  //           dup-{5,10}-gram char coverage   = Σ over grams occurring ≥2
  //             of count × gram_chars (every occurrence's span counted;
  //             no overlap collapse — a closed-form both engines compute
  //             identically, monotone in repetition, which is all a
  //             threshold rule needs)
  //         Rules (Table A1 thresholds, integer cross-multiplied — no
  //         float anywhere): top2 ≤ 20%, top3 ≤ 18%, top4 ≤ 16% of
  //         n_chars; dup5 ≤ 15%, dup10 ≤ 10%. The line/paragraph
  //         variants are the same mechanism over a different segmenter —
  //         the fixture corpus is single-line, so they would be
  //         degenerate here (q124's segment dedup covers the segmented
  //         form cross-doc).
  //         Scale shape: the metric is PER-DOCUMENT, so it is computed
  //         MAP-SIDE ONLY — one fused codegen kernel (RepCovsExpr) per
  //         row over the split-token array, then a 20-row-out rollup.
  //         Nothing shuffles but the final per-source partial aggregate;
  //         no gram string, digest, or window row ever leaves the row.
  //         The cheapest possible 100 TB shape (same as q149, with the
  //         window machinery fused into one expression).
  private val RepTopNs = Seq(2, 3, 4)
  private val RepDupNs = Seq(5, 10)
  // thresholds ×100: top2>20%, top3>18%, top4>16%, dup5>15%, dup10>10%
  private val RepThr100: Map[Int, Int] =
    Map(2 -> 20, 3 -> 18, 4 -> 16, 5 -> 15, 10 -> 10)

  /** Per-doc integer repetition metrics (doc_id, source, n_chars,
    * cov2..cov4 top coverage, dup5/dup10 duplicated coverage). Factored
    * from q193 so CurationSpec can pin the arithmetic on planted docs.
    *
    * The metric is row-local, so it runs as ONE fused codegen kernel
    * (RepCovsExpr) over the split-token array — no explode, no shuffle,
    * no per-window HOF interpretation. The first-cut explode + two
    * shuffled groupBys formulation measured 455s at the 100× rehearsal
    * for what is a map-only pass; this plan has no exchange before
    * q193's 20-row rollup. */
  def repetitionSignals(docs: DataFrame): DataFrame = {
    val covs = org.apache.spark.sql.graft.RepCovsExpr.column(
      split(col("text"), "[\\t\\n\\f\\r ]+"))
    docs.select(col("doc_id"), col("source"), col("n_chars"),
        covs.as("_cv"))
      .select(col("doc_id") +: col("source") +: col("n_chars") +:
        (RepTopNs.zipWithIndex.map { case (n, i) =>
          col("_cv")(i).as(s"cov$n") } ++
         RepDupNs.zipWithIndex.map { case (n, i) =>
          col("_cv")(i + RepTopNs.length).as(s"dup$n") }): _*)
  }

  def q193(s: SparkSession, dir: String): DataFrame = {
    val m = repetitionSignals(documents(s, dir))
    def fail(c: Column, n: Int): Column =
      c * 100L > col("n_chars") * RepThr100(n)
    val fails = RepTopNs.map(n => fail(col(s"cov$n"), n).as(s"_f$n")) ++
      RepDupNs.map(n => fail(col(s"dup$n"), n).as(s"_f$n"))
    val r = m.select(col("source") +: col("n_chars") +: fails: _*)
    val allNs = RepTopNs ++ RepDupNs
    val kept = allNs.map(n => !col(s"_f$n")).reduce(_ && _)
    val aggs = count(lit(1)).as("n_docs") +:
      (allNs.map(n =>
        count(when(col(s"_f$n"), 1)).as(s"fail_n$n")) :+
       count(when(kept, 1)).as("n_kept"))
    r.groupBy(col("source"))
      .agg(aggs.head, aggs.tail: _*)
      .orderBy(col("source"))
  }

  val q193Sql: String = {
    def gramCte(n: Int): String =
      s"""gr$n AS (
         |  SELECT doc_id, $n AS n, g, count(*) AS cnt, max(len(g)) AS glen
         |  FROM (
         |    SELECT doc_id,
         |      unnest([array_to_string(toks[CAST(i AS INT):CAST(i AS INT)+${n - 1}], ' ')
         |              for i in range(1, len(toks) - ${n - 2})]) AS g
         |    FROM dd WHERE len(toks) >= $n)
         |  GROUP BY doc_id, g)""".stripMargin
    val allNs = RepTopNs ++ RepDupNs
    val covSelects = allNs.map { n =>
      val agg = if (n <= 4) "max(cnt * glen)"
        else "sum(CASE WHEN cnt >= 2 THEN cnt * glen ELSE 0 END)"
      s"SELECT doc_id, $n AS n, $agg AS cov FROM gr$n GROUP BY doc_id"
    }.mkString("\nUNION ALL\n")
    val covCols = allNs.map(n =>
      s"coalesce(max(CASE WHEN c.n = $n THEN c.cov END), 0) AS cov$n")
      .mkString(",\n    ")
    val failCounts = allNs.map(n =>
      s"count(*) FILTER (WHERE cov$n * 100 > ${RepThr100(n)} * n_chars) AS fail_n$n")
      .mkString(",\n  ")
    val keptPred = allNs.map(n =>
      s"cov$n * 100 <= ${RepThr100(n)} * n_chars").mkString(" AND ")
    s"""WITH dd AS (
       |  SELECT doc_id, source, n_chars,
       |    regexp_extract_all(text, '\\S+') AS toks
       |  FROM documents),
       |${allNs.map(gramCte).mkString(",\n")},
       |cov AS (
       |$covSelects),
       |per AS (
       |  SELECT d.doc_id, any_value(d.source) AS source,
       |    any_value(d.n_chars) AS n_chars,
       |    $covCols
       |  FROM dd d LEFT JOIN cov c USING (doc_id)
       |  GROUP BY d.doc_id)
       |SELECT source, count(*) AS n_docs,
       |  $failCounts,
       |  count(*) FILTER (WHERE $keptPred) AS n_kept
       |FROM per
       |GROUP BY source ORDER BY source""".stripMargin
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q193_repetition_signals" -> q193,
    "q164_source_weighted_sample" -> q164,
    "q163_weighted_sample" -> q163,
    "q162_erasure_audit" -> q162,
    "q149_gopher_rules" -> q149,
    "q150_domain_cap" -> q150,
    "q151_token_fertility" -> q151,
    "q152_hll_users" -> q152,
    "q153_sketch_ledger" -> q153,
    "q154_overlap_sketch" -> q154,
    "q159_blocklist" -> q159)

  val oracle: Map[String, String] = Map(
    "q193_repetition_signals" -> q193Sql,
    "q164_source_weighted_sample" -> q164Sql,
    "q163_weighted_sample" -> q163Sql,
    "q162_erasure_audit" -> q162Sql,
    "q149_gopher_rules" -> q149Sql,
    "q150_domain_cap" -> q150Sql,
    "q151_token_fertility" -> q151Sql,
    "q152_hll_users" -> q152Sql,
    "q153_sketch_ledger" -> q153Sql,
    "q154_overlap_sketch" -> q154Sql,
    "q159_blocklist" -> q159Sql)
}
