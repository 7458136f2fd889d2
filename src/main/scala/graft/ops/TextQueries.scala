package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.OperatorCaches.TrackedDataset
import graft.Tables._

/** Text-analysis operators over the `documents` table (north-star
  * LLM-data-pipeline surface, BASELINE.json): quality stats, language ID,
  * token frequency, content fingerprinting. All pure Catalyst expressions —
  * no UDFs, everything stays inside WholeStageCodegen; ratios are computed
  * as exact-integer-sum divisions so they are bit-identical to DuckDB.
  */
object TextQueries {

  /** Whitespace tokens as an array column (empty-safe). Whitespace is the
    * EXPLICIT class [\t\n\f\r ] rather than \s — Java's \s includes
    * vertical tab (\x0B), RE2's does not, so \s would silently diverge
    * from the DuckDB oracle on a \x0B-bearing document (the
    * Dedup.normalizeText discipline; every token-count site in the repo
    * uses the same class, pinned by EdgeSpec). */
  def tokens(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    filter(split(c, "[\\t\\n\\f\\r ]+"), t => length(t) > 0)

  /** BPE-ish subword pattern: runs of ≤4 alphanumerics, digit runs, or a
    * single non-space symbol — a cheap stand-in for a BPE tokenizer's piece
    * count (explicit whitespace class, not \s: identical in Java and RE2,
    * so DuckDB oracles it bit-for-bit even on \x0B input). */
  val SubtokenPattern = "[A-Za-z0-9]{1,4}|[^A-Za-z0-9\\t\\n\\f\\r ]"

  /** See graft.ops.Scale.fanout (shared numbered-fanout helper). */
  private def fanout(df: DataFrame, key: String): DataFrame =
    Scale.fanout(df, key)

  /** The 6-term integer fixed-point quality logit (1e-4 units) — the ONE
    * definition behind q133 (whose weight-table join mirrors these
    * constants), q135, q139 and q145. Change a weight here and in the
    * q133 table + the four SQL oracles together. All five counts come
    * from ONE TextStatsExpr byte scan (was five regexp_count traversals
    * per carrier row — fixture-identical; \b follows the oracle's RE2
    * semantics, see the kernel's scaladoc). */
  def qualityLogit(text: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    val ts = org.apache.spark.sql.graft.TextStatsExpr.column(text)
    lit(20000L) +
      element_at(ts, 1) * 15L +
      element_at(ts, 6) * 400L -
      element_at(ts, 7) * 250L -
      element_at(ts, 4) * 120L -
      element_at(ts, 5) * 600L
  }

  /** The q28/q45 4-word stop set and the q29/q138 language-marker sets —
    * counted by the StopCountsExpr island kernel (RE2-ASCII \b, the
    * oracle's semantics) instead of java regexp_count. */
  private val QualityStopSet = Seq("the", "a", "of", "and")
  private val LangMarkerSets = Seq(
    Seq("the", "a", "is", "of"), Seq("der", "die", "und", "ist"),
    Seq("el", "los", "es", "y"), Seq("le", "les", "est", "et"))

  /** q29/q138's marker-argmax language prediction over a text column —
    * the four \b marker-set scores come from ONE StopCountsExpr byte scan
    * (was four java-regex traversals per row, each with the latent
    * Unicode-\b divergence); the zh literal count has no \b (Java and RE2
    * agree) and stays regexp_count. Column duplication across the when
    * chain is collapsed by codegen subexpression elimination. */
  private def langPredicted(text: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    val sc = org.apache.spark.sql.graft.StopCountsExpr.column(text, LangMarkerSets)
    val en = element_at(sc, 1)
    val de = element_at(sc, 2)
    val es = element_at(sc, 3)
    val fr = element_at(sc, 4)
    val zh = regexp_count(text, lit("的|是")).cast("long")
    when(en > 0 && en >= greatest(de, es, fr, zh), "en")
      .when(de > 0 && de >= greatest(es, fr, zh), "de")
      .when(es > 0 && es >= greatest(fr, zh), "es")
      .when(fr > 0 && fr >= zh, "fr")
      .when(zh > 0, "zh")
      .otherwise("und")
  }

  // ── q28: per-language corpus quality stats — doc count, exact avg chars /
  //        tokens / BPE-ish subtokens, punctuation + stopword ratios from
  //        integer count sums.
  def q28(s: SparkSession, dir: String): DataFrame =
    documents(s, dir)
      .withColumn("_ts", org.apache.spark.sql.graft.TextStatsExpr.column(col("text")))
      .select(
        col("lang"), col("n_chars"),
        element_at(col("_ts"), 1).as("n_tokens"),
        element_at(col("_ts"), 8).as("n_subtokens"),
        element_at(col("_ts"), 7).as("n_punct"),
        // island kernel, NOT java regexp_count: \b follows the oracle's
        // RE2 ASCII semantics (the last latent divergence class — VERDICT
        // r14 #1); one byte scan replaces three regex traversals here
        org.apache.spark.sql.graft.StopCountsExpr
          .single(col("text"), QualityStopSet).as("n_stop"))
      .groupBy(col("lang"))
      .agg(
        count(lit(1)).as("n_docs"),
        avg(col("n_chars")).as("avg_chars"),
        avg(col("n_tokens")).as("avg_tokens"),
        avg(col("n_subtokens")).as("avg_subtokens"),
        (sum(col("n_punct")) / sum(col("n_chars"))).as("punct_ratio"),
        (sum(col("n_stop")) / sum(col("n_tokens"))).as("stopword_ratio"))
      .orderBy(col("lang"))

  val q28Sql: String =
    """WITH d AS (
      |  SELECT lang, n_chars,
      |    len(regexp_extract_all(text, '\S+')) AS n_tokens,
      |    len(regexp_extract_all(text, '[A-Za-z0-9]{1,4}|[^A-Za-z0-9\s]')) AS n_subtokens,
      |    len(regexp_extract_all(text, '[.,!?;:]')) AS n_punct,
      |    len(regexp_extract_all(text, '\b(the|a|of|and)\b')) AS n_stop
      |  FROM documents)
      |SELECT lang, count(*) AS n_docs,
      |  avg(n_chars) AS avg_chars,
      |  avg(n_tokens) AS avg_tokens,
      |  avg(n_subtokens) AS avg_subtokens,
      |  CAST(sum(n_punct) AS BIGINT) / CAST(sum(n_chars) AS BIGINT) AS punct_ratio,
      |  CAST(sum(n_stop) AS BIGINT) / CAST(sum(n_tokens) AS BIGINT) AS stopword_ratio
      |FROM d GROUP BY lang ORDER BY lang""".stripMargin

  // ── q29: n-gram/stopword-marker language ID — deterministic argmax over
  //        per-language marker-hit counts with a fixed priority order;
  //        confusion-matrix output (actual lang × predicted).
  def q29(s: SparkSession, dir: String): DataFrame =
    documents(s, dir)
      .withColumn("predicted", langPredicted(col("text")))
      .groupBy(col("lang"), col("predicted"))
      .agg(count(lit(1)).as("n_docs"))
      .orderBy(col("lang"), col("predicted"))

  val q29Sql: String =
    """WITH scored AS (
      |  SELECT lang,
      |    len(regexp_extract_all(text, '\b(the|a|is|of)\b')) AS s_en,
      |    len(regexp_extract_all(text, '\b(der|die|und|ist)\b')) AS s_de,
      |    len(regexp_extract_all(text, '\b(el|los|es|y)\b')) AS s_es,
      |    len(regexp_extract_all(text, '\b(le|les|est|et)\b')) AS s_fr,
      |    len(regexp_extract_all(text, '的|是')) AS s_zh
      |  FROM documents),
      |pred AS (
      |  SELECT lang,
      |    CASE WHEN s_en > 0 AND s_en >= greatest(s_de, s_es, s_fr, s_zh) THEN 'en'
      |         WHEN s_de > 0 AND s_de >= greatest(s_es, s_fr, s_zh) THEN 'de'
      |         WHEN s_es > 0 AND s_es >= greatest(s_fr, s_zh) THEN 'es'
      |         WHEN s_fr > 0 AND s_fr >= s_zh THEN 'fr'
      |         WHEN s_zh > 0 THEN 'zh'
      |         ELSE 'und' END AS predicted
      |  FROM scored)
      |SELECT lang, predicted, count(*) AS n_docs
      |FROM pred GROUP BY lang, predicted ORDER BY lang, predicted""".stripMargin

  // ── q30: global token frequency top-20 (explode → hash agg →
  //        TakeOrderedAndProject; at 100 TB the partial agg absorbs the
  //        token skew before the single small shuffle).
  def q30(s: SparkSession, dir: String): DataFrame =
    documents(s, dir)
      .select(explode(tokens(col("text"))).as("token"))
      .groupBy(col("token"))
      .agg(count(lit(1)).as("n"))
      .orderBy(desc("n"), col("token"))
      .limit(20)

  val q30Sql: String =
    """SELECT token, count(*) AS n FROM (
      |  SELECT unnest(regexp_extract_all(text, '\S+')) AS token FROM documents)
      |GROUP BY token ORDER BY n DESC, token LIMIT 20""".stripMargin

  // ── q31: content fingerprinting — SHA-256 digest per document, distinct
  //        fingerprints per source (the exact-dedup key at scale; the
  //        digest shuffles instead of the full text).
  def q31(s: SparkSession, dir: String): DataFrame =
    documents(s, dir)
      .select(col("source"), sha2(col("text"), 256).as("fp"))
      .groupBy(col("source"))
      .agg(
        count(lit(1)).as("n_docs"),
        countDistinct(col("fp")).as("n_unique_fp"))
      .orderBy(col("source"))

  val q31Sql: String =
    """SELECT source, count(*) AS n_docs,
      |  count(DISTINCT sha256(text)) AS n_unique_fp
      |FROM documents GROUP BY source ORDER BY source""".stripMargin

  // ── q45: per-document quality score + keep/drop decision — the
  //        training-data filter stage: weighted blend of length, token
  //        count, and stopword signals, deterministic arithmetic only
  //        (divisions of exact ints → bit-identical in DuckDB).
  /** Rounded quality score over (text, n_chars) — weighted blend of
    * length, token count, and stopword signals; round4'd so both engines
    * agree bit-for-bit. Shared by q45 and the q57 training-prep pipeline. */
  def qualityScore: org.apache.spark.sql.Column = {
    val nTokens = element_at(
      org.apache.spark.sql.graft.TextStatsExpr.column(col("text")), 1)
    val nStop = org.apache.spark.sql.graft.StopCountsExpr
      .single(col("text"), QualityStopSet)
    val score =
      least(col("n_chars") / 500.0, lit(1.0)) * 0.5 +
        least(nTokens / 80.0, lit(1.0)) * 0.3 +
        least(nStop / 5.0, lit(1.0)) * 0.2
    round(score * 10000) / 10000.0
  }

  def q45(s: SparkSession, dir: String): DataFrame = {
    val nTokens = element_at(
      org.apache.spark.sql.graft.TextStatsExpr.column(col("text")), 1)
    documents(s, dir)
      .select(col("doc_id"), col("lang"), nTokens.as("n_tokens"),
        qualityScore.as("quality_score"))
      .withColumn("keep", col("quality_score") >= 0.5)
      .orderBy(col("doc_id"))
  }

  val q45Sql: String =
    """SELECT doc_id, lang,
      |  len(regexp_extract_all(text, '\S+')) AS n_tokens,
      |  round((least(n_chars / 500.0, 1.0) * 0.5
      |       + least(len(regexp_extract_all(text, '\S+')) / 80.0, 1.0) * 0.3
      |       + least(len(regexp_extract_all(text, '\b(the|a|of|and)\b')) / 5.0, 1.0) * 0.2)
      |      * 10000) / 10000.0 AS quality_score,
      |  round((least(n_chars / 500.0, 1.0) * 0.5
      |       + least(len(regexp_extract_all(text, '\S+')) / 80.0, 1.0) * 0.3
      |       + least(len(regexp_extract_all(text, '\b(the|a|of|and)\b')) / 5.0, 1.0) * 0.2)
      |      * 10000) / 10000.0 >= 0.5 AS keep
      |FROM documents ORDER BY doc_id""".stripMargin

  // ── q65: Gopher-style repetition filter — fraction of DUPLICATE word
  //        2-grams per document (1 − distinct/total); repetitive boilerplate
  //        scores high and is dropped. Pure scalar array ops on a staged
  //        token array (size/array_distinct — no explode, no shuffle except
  //        the output sort); the ratio divides two exact ints so both
  //        engines agree bit-for-bit after round4.
  def repetitionStats(docs: DataFrame, textCol: String, idCol: String,
      gram: Int = 2): DataFrame = {
    // token array staged as a real column BEFORE the shingle windows —
    // embedding tokens() in the window lambda would re-split the text per
    // window (the nested-HOF O(n²) trap; shinglesFromTokens' contract).
    // CollapseProject keeps the stages apart because the alias is used
    // more than once (its non-cheap-duplication guard).
    val toked = docs.select(col(idCol).as("doc_id"),
      tokens(col(textCol)).as("_toks"))
    val staged = toked.select(col("doc_id"),
      graft.operators.Dedup.shinglesFromTokens(col("_toks"), gram).as("_grams"))
    staged.select(col("doc_id"),
      size(col("_grams")).cast("long").as("n_grams"),
      size(array_distinct(col("_grams"))).cast("long").as("n_distinct"))
      .withColumn("dup_frac",
        round((lit(1.0) - col("n_distinct") / col("n_grams").cast("double"))
          * 10000) / 10000.0)
  }

  def q65(s: SparkSession, dir: String): DataFrame =
    repetitionStats(documents(s, dir), "text", "doc_id")
      .withColumn("keep", col("dup_frac") <= 0.05)
      .orderBy(col("doc_id"))

  val q65Sql: String =
    """WITH g AS (
      |  SELECT doc_id,
      |    CASE WHEN len(toks) < 2 THEN [array_to_string(toks, ' ')]
      |      ELSE [array_to_string(toks[CAST(i AS INT):CAST(i AS INT)+1], ' ')
      |            for i in range(1, len(toks))] END AS grams
      |  FROM (SELECT doc_id, regexp_extract_all(text, '\S+') AS toks
      |        FROM documents))
      |SELECT doc_id,
      |  CAST(len(grams) AS BIGINT) AS n_grams,
      |  CAST(len(list_distinct(grams)) AS BIGINT) AS n_distinct,
      |  round((1.0 - len(list_distinct(grams)) / len(grams)::DOUBLE) * 10000)
      |    / 10000.0 AS dup_frac,
      |  round((1.0 - len(list_distinct(grams)) / len(grams)::DOUBLE) * 10000)
      |    / 10000.0 <= 0.05 AS keep
      |FROM g ORDER BY doc_id""".stripMargin

  // ── q76: per-document TF-IDF top terms — the classic "what is this
  //        document about" signal, and the shape every keyword-extraction /
  //        BM25-features stage takes at scale: tf is a (doc, term) count,
  //        df a term count, and the top-k a bounded per-doc window. All
  //        three are map-side-combinable aggregates; the join ships only
  //        the tiny (term, df) relation (vocabulary-sized → broadcast).
  //        round-to-4 absorbs the ≤1 ulp Math.log-vs-libm divergence.
  def q76(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val tok = documents(s, dir).select(col("doc_id"),
      explode(expr("regexp_extract_all(lower(text), '[a-z0-9]+', 0)")).as("t"))
      .trackedPersist()
    val tf = tok.groupBy(col("doc_id"), col("t")).agg(count(lit(1)).as("tf"))
    val dfreq = tok.groupBy(col("t")).agg(countDistinct(col("doc_id")).as("df"))
    val n = tok.agg(countDistinct(col("doc_id")).as("n"))
    val scored = tf.join(broadcast(dfreq), "t").crossJoin(broadcast(n))
      .withColumn("tfidf",
        round(col("tf") * log(col("n").cast("double") / col("df")) * 10000)
          / 10000.0)
    val w = Window.partitionBy(col("doc_id"))
      .orderBy(col("tfidf").desc, col("t"))
    scored.withColumn("rk", row_number().over(w)).where(col("rk") <= 3)
      .select(col("doc_id"), col("t").as("token"), col("tf"), col("df"),
        col("tfidf"))
      .orderBy(col("doc_id"), col("tfidf").desc, col("token"))
  }

  val q76Sql: String =
    """WITH tok AS (
      |  SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS t
      |  FROM documents),
      |tf AS (SELECT doc_id, t, count(*) AS tf FROM tok GROUP BY 1, 2),
      |df AS (SELECT t, count(DISTINCT doc_id) AS df FROM tok GROUP BY 1),
      |n AS (SELECT count(DISTINCT doc_id) AS n FROM tok),
      |scored AS (
      |  SELECT tf.doc_id, tf.t, tf.tf, df.df,
      |    round(tf.tf * ln(CAST(n.n AS DOUBLE) / df.df) * 10000) / 10000.0
      |      AS tfidf
      |  FROM tf JOIN df USING (t) CROSS JOIN n),
      |ranked AS (
      |  SELECT *, row_number() OVER (
      |    PARTITION BY doc_id ORDER BY tfidf DESC, t) AS rk
      |  FROM scored)
      |SELECT doc_id, t AS token, tf, df, tfidf FROM ranked WHERE rk <= 3
      |ORDER BY doc_id, tfidf DESC, token""".stripMargin

  // ── q95: EXACT heavy hitters via a two-pass Misra-Gries sketch — the
  //        hot-key detector (what to salt in q80, what to cache, what to
  //        stoplist). Pass 1: one scan folds every partition into a ≤512-
  //        entry mergeable sketch + the exact stream length (single
  //        aggregate, map side emits ≤512 counters per partition — the
  //        full token domain NEVER shuffles, unlike q30's groupBy). Pass 2:
  //        recount only the candidate tokens (broadcast semi-join; partial
  //        agg absorbs the hot keys' row counts before the exchange) and
  //        keep count·500 ≥ total. The MG superset guarantee (every item
  //        with frequency > n/513 survives m=512) makes the output EXACTLY
  //        `GROUP BY token HAVING count(*)·500 ≥ n` — the DuckDB oracle —
  //        even though the sketch's candidate set itself is partition-
  //        dependent. Integer threshold arithmetic: bit-exact cross-engine.
  def heavyHitters(toks: DataFrame, tokenCol: String, supportDenom: Int,
      m: Int): DataFrame = {
    require(m + 1 > supportDenom,
      s"capacity m=$m too small for support 1/$supportDenom (need m+1 > denom)")
    val tok = toks.select(col(tokenCol).as("token")).trackedPersist()
    val pass1 = tok.agg(
      org.apache.spark.sql.graft.FreqSketch.of(col("token"), m).as("cands"),
      count(lit(1)).as("total"))
    // one row → ≤ m rows; carrying `total` on each avoids re-running pass 1
    val cands = pass1.select(explode(col("cands")).as("token"), col("total"))
    tok.join(broadcast(cands), "token")
      .groupBy(col("token"))
      .agg(count(lit(1)).as("n"), max(col("total")).as("_total"))
      .where(col("n") * supportDenom >= col("_total"))
      .select(col("token"), col("n"))
      .orderBy(desc("n"), col("token"))
  }

  def q95(s: SparkSession, dir: String): DataFrame =
    heavyHitters(
      documents(s, dir).select(explode(tokens(col("text"))).as("token")),
      "token", supportDenom = 500, m = 512)

  val q95Sql: String =
    """WITH tok AS (
      |  SELECT unnest(regexp_extract_all(text, '\S+')) AS token FROM documents)
      |SELECT token, count(*) AS n FROM tok GROUP BY token
      |HAVING count(*) * 500 >= (SELECT count(*) FROM tok)
      |ORDER BY n DESC, token""".stripMargin

  // ── q102: corpus length histogram — fixed-width doc-length buckets with
  //         per-(source, bucket) counts and integer-exact permille share
  //         (the "know your corpus before training on it" profile). One
  //         scan, one partial-agged shuffle on (source, bucket); the
  //         per-source totals ride a bounded window over the ~|sources| ×
  //         |buckets| aggregate, never the raw docs.
  def q102(s: SparkSession, dir: String): DataFrame = {
    val bucketW = 200
    val agg = documents(s, dir)
      .groupBy(col("source"),
        (floor(length(col("text")) / bucketW) * bucketW).as("len_bucket"))
      .agg(count(lit(1)).as("n"))
    val w = Window.partitionBy(col("source"))
    agg.withColumn("permille", (col("n") * 1000) / sum(col("n")).over(w))
      .orderBy(col("source"), col("len_bucket"))
  }

  val q102Sql: String =
    """WITH agg AS (
      |  SELECT source,
      |    CAST(floor(length(text) / 200) * 200 AS BIGINT) AS len_bucket,
      |    count(*) AS n
      |  FROM documents GROUP BY 1, 2)
      |SELECT source, len_bucket, n,
      |  (n * 1000) / sum(n) OVER (PARTITION BY source) AS permille
      |FROM agg ORDER BY source, len_bucket""".stripMargin

  // ── q104: dataset card — the one-row corpus profile that heads a
  //         training-data release: volume, source/language spread, exact
  //         duplicate rate (by content digest), length extremes. One scan;
  //         the distinct digests shuffle 32 bytes/doc (q31's key), the
  //         counts ride partial aggregates.
  def q104(s: SparkSession, dir: String): DataFrame =
    documents(s, dir)
      .select(col("source"), col("lang"), col("n_chars"),
        sha2(col("text"), 256).as("fp"),
        regexp_count(col("text"), lit("[^\\t\\n\\f\\r ]+")).cast("long").as("n_tokens"))
      .agg(
        count(lit(1)).as("n_docs"),
        countDistinct(col("source")).as("n_sources"),
        countDistinct(col("lang")).as("n_langs"),
        sum(col("n_chars")).as("total_chars"),
        sum(col("n_tokens")).as("total_tokens"),
        countDistinct(col("fp")).as("n_unique_docs"),
        min(col("n_chars")).as("min_chars"),
        max(col("n_chars")).as("max_chars"))
      .withColumn("dup_permille",
        // nullif: total on empty input (the q10 ANSI divide-by-zero fix)
        ((col("n_docs") - col("n_unique_docs")) * 1000) /
          nullif(col("n_docs"), lit(0)))

  val q104Sql: String =
    """SELECT count(*) AS n_docs,
      |  count(DISTINCT source) AS n_sources,
      |  count(DISTINCT lang) AS n_langs,
      |  CAST(sum(n_chars) AS BIGINT) AS total_chars,
      |  CAST(sum(len(regexp_extract_all(text, '\S+'))) AS BIGINT) AS total_tokens,
      |  count(DISTINCT sha256(text)) AS n_unique_docs,
      |  min(n_chars) AS min_chars, max(n_chars) AS max_chars,
      |  ((count(*) - count(DISTINCT sha256(text))) * 1000)
      |    / nullif(count(*), 0) AS dup_permille
      |FROM documents""".stripMargin

  // ── q112: BM25 top-k retrieval (Robertson idf, k1=1.2, b=0.75) for a
  //        fixed query-term set — the sparse-retrieval scorer a training
  //        pipeline uses to mine topical subsets from a corpus. Scale
  //        shape: ONE groupBy(doc_id) with conditional per-term tf counts
  //        (the token domain never shuffles, unlike a (doc,term) explode→
  //        groupBy), a 1-row corpus-stats agg broadcast back, pure-
  //        expression scoring, TakeOrderedAndProject top-10. The per-term
  //        scores are summed in FIXED literal order (ts1+ts2+ts3) and the
  //        expression text is shared verbatim with the oracle via
  //        `bm25TermScore`, so float non-associativity cannot diverge.
  val Bm25Terms: Seq[String] = Seq("spark", "merge", "vector")

  /** One query-term's BM25 contribution as SQL text — used verbatim by
    * BOTH the Spark selectExpr and the DuckDB oracle (the oracle-parity
    * rule: identical token order for every float op). tf=0 contributes
    * exactly 0.0 (numerator zeroes, denominator stays positive). */
  private def bm25TermScore(i: Int): String =
    s"(ln(1.0 + (cast(n AS DOUBLE) - df$i + 0.5) / (df$i + 0.5)) * " +
      s"(tf$i * 2.2) / " +
      s"(tf$i + 1.2 * (0.25 + 0.75 * dl / (cast(sumdl AS DOUBLE) / n))))"

  private val bm25Projection: Seq[String] = Seq(
    "doc_id", "dl",
    "cast(tf1 > 0 AS BIGINT) + cast(tf2 > 0 AS BIGINT) + " +
      "cast(tf3 > 0 AS BIGINT) AS n_terms_hit",
    s"round((${bm25TermScore(1)} + ${bm25TermScore(2)} + " +
      s"${bm25TermScore(3)}) * 10000) / 10000 AS score")

  def q112(s: SparkSession, dir: String): DataFrame = {
    val Seq(t1, t2, t3) = Bm25Terms
    val perDoc = documents(s, dir)
      .select(col("doc_id"),
        explode(expr("regexp_extract_all(lower(text), '[a-z0-9]+', 0)"))
          .as("t"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("dl"),
        count(when(col("t") === t1, 1)).as("tf1"),
        count(when(col("t") === t2, 1)).as("tf2"),
        count(when(col("t") === t3, 1)).as("tf3"))
      .trackedPersist()
    val stats = perDoc.agg(
      count(lit(1)).as("n"), sum(col("dl")).as("sumdl"),
      count(when(col("tf1") > 0, 1)).as("df1"),
      count(when(col("tf2") > 0, 1)).as("df2"),
      count(when(col("tf3") > 0, 1)).as("df3"))
    perDoc.crossJoin(broadcast(stats))
      .where("tf1 > 0 OR tf2 > 0 OR tf3 > 0")
      .selectExpr(bm25Projection: _*)
      .orderBy(col("score").desc, col("doc_id"))
      .limit(10)
  }

  val q112Sql: String = {
    val Seq(t1, t2, t3) = Bm25Terms
    s"""WITH tok AS (
       |  SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z0-9]+'))
       |    AS t
       |  FROM documents),
       |d AS (
       |  SELECT doc_id, count(*) AS dl,
       |    count(*) FILTER (WHERE t = '$t1') AS tf1,
       |    count(*) FILTER (WHERE t = '$t2') AS tf2,
       |    count(*) FILTER (WHERE t = '$t3') AS tf3
       |  FROM tok GROUP BY 1),
       |s AS (
       |  SELECT count(*) AS n, CAST(sum(dl) AS BIGINT) AS sumdl,
       |    count(*) FILTER (WHERE tf1 > 0) AS df1,
       |    count(*) FILTER (WHERE tf2 > 0) AS df2,
       |    count(*) FILTER (WHERE tf3 > 0) AS df3
       |  FROM d)
       |SELECT ${bm25Projection.mkString(",\n  ")}
       |FROM d CROSS JOIN s
       |WHERE tf1 > 0 OR tf2 > 0 OR tf3 > 0
       |ORDER BY score DESC, doc_id LIMIT 10""".stripMargin
  }

  // ── q116: per-source DISTINCTIVE tokens by add-1-smoothed log-odds
  //        ratio vs the rest of the corpus — the "what characterizes this
  //        domain" contrast a mixture designer reads before weighting
  //        sources (Monroe et al.'s fightin'-words statistic, the
  //        smoothed form). Integer count plumbing: one (source,token)
  //        groupBy, per-source and per-token rollups derived FROM it
  //        (never a second scan), grand total broadcast; the only float
  //        math is the shared-text lor expression. Top-3 per source via
  //        row_number — a per-source window, never single-partition.
  private val lorExpr: String =
    "round((ln((a + 1.0) / (src_total - a + 1.0)) - " +
      "ln((c + 1.0) / (rest_total - c + 1.0))) * 10000) / 10000.0"

  def q116(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val st = documents(s, dir)
      .select(col("source"), explode(
        expr("regexp_extract_all(lower(text), '[a-z0-9]+', 0)")).as("t"))
      .groupBy(col("source"), col("t"))
      .agg(count(lit(1)).as("a"))
      .trackedPersist()
    val perSource = st.groupBy(col("source")).agg(sum(col("a")).as("src_total"))
    val perToken = st.groupBy(col("t")).agg(sum(col("a")).as("tok_total"))
    val grand = st.agg(sum(col("a")).as("grand_total"))
    val scored = st
      .join(broadcast(perSource), "source")
      .join(perToken, "t")
      .crossJoin(broadcast(grand))
      .withColumn("c", col("tok_total") - col("a"))
      .withColumn("rest_total", col("grand_total") - col("src_total"))
      .selectExpr("source", "t AS token", "a AS n_in", "c AS n_out",
        s"$lorExpr AS lor")
    val w = Window.partitionBy(col("source"))
      .orderBy(col("lor").desc, col("token"))
    scored.withColumn("rk", row_number().over(w)).where(col("rk") <= 3)
      .select(col("source"), col("token"), col("n_in"), col("n_out"),
        col("lor"))
      .orderBy(col("source"), col("lor").desc, col("token"))
  }

  val q116Sql: String =
    s"""WITH tok AS (
       |  SELECT source, unnest(regexp_extract_all(lower(text), '[a-z0-9]+'))
       |    AS t
       |  FROM documents),
       |st AS (SELECT source, t, count(*) AS a FROM tok GROUP BY 1, 2),
       |ps AS (SELECT source, CAST(sum(a) AS BIGINT) AS src_total
       |  FROM st GROUP BY 1),
       |pt AS (SELECT t, CAST(sum(a) AS BIGINT) AS tok_total FROM st GROUP BY 1),
       |g AS (SELECT CAST(sum(a) AS BIGINT) AS grand_total FROM st),
       |scored AS (
       |  SELECT st.source, st.t AS token, st.a AS n_in,
       |    pt.tok_total - st.a AS c, st.a AS a, ps.src_total,
       |    g.grand_total - ps.src_total AS rest_total
       |  FROM st JOIN ps USING (source) JOIN pt USING (t) CROSS JOIN g),
       |lo AS (
       |  SELECT source, token, n_in, c AS n_out, $lorExpr AS lor
       |  FROM scored),
       |ranked AS (
       |  SELECT *, row_number() OVER (
       |    PARTITION BY source ORDER BY lor DESC, token) AS rk
       |  FROM lo)
       |SELECT source, token, n_in, n_out, lor FROM ranked WHERE rk <= 3
       |ORDER BY source, lor DESC, token""".stripMargin

  // ── q117: BPE pair statistics — the inner step of byte-pair-encoding
  //        vocabulary induction (Sennrich et al. 2016): count adjacent
  //        character pairs over the corpus, weighted by word frequency,
  //        and surface the top merge candidates. Scale shape: the corpus
  //        collapses to the frequency-weighted VOCABULARY first (one
  //        token-domain groupBy — identical cost to q30), and the pair
  //        explode runs over distinct words only (vocab × avg-word-len
  //        rows, corpus-size-independent); each further merge round in a
  //        real trainer repeats this same vocabulary-sized job. Integer-
  //        only output; top-20 via TakeOrderedAndProject.
  def q117(s: SparkSession, dir: String): DataFrame = {
    val vocab = documents(s, dir)
      .select(explode(
        expr("regexp_extract_all(lower(text), '[a-z0-9]+', 0)")).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("freq"))
    val nPairs = length(col("w")) - 1
    vocab
      .select(col("w"), col("freq"),
        explode(when(nPairs < 1, array().cast("array<int>"))
          .otherwise(sequence(lit(1), nPairs))).as("i"))
      .select(expr("substring(w, i, 1)").as("left"),
        expr("substring(w, i + 1, 1)").as("right"), col("freq"))
      .groupBy(col("left"), col("right"))
      .agg(sum(col("freq")).as("n"))
      .orderBy(col("n").desc, col("left"), col("right"))
      .limit(20)
  }

  // generate_series(1, 4096) is an oracle-only position bound (the q114
  // convention; fixture tokens are <100 chars — a >4096-char token would
  // silently under-count pairs oracle-side, never Spark-side)
  val q117Sql: String =
    """WITH tok AS (
      |  SELECT unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS w
      |  FROM documents),
      |vocab AS (SELECT w, count(*) AS freq FROM tok GROUP BY 1),
      |pairs AS (
      |  SELECT substring(w, i, 1) AS "left",
      |    substring(w, i + 1, 1) AS "right", freq
      |  FROM vocab CROSS JOIN generate_series(1, 4096) t(i)
      |  WHERE i <= len(w) - 1)
      |SELECT "left", "right", CAST(sum(freq) AS BIGINT) AS n
      |FROM pairs GROUP BY 1, 2
      |ORDER BY n DESC, "left", "right" LIMIT 20""".stripMargin

  // ── q118: MULTI-ROUND BPE merge induction — the full iterative form of
  //        q117 (its oracle-green mechanism twin; q118's round 1 must and
  //        does equal q117's top row, asserted in spec). Corpus-scale
  //        work is the one distributed token groupBy; the merge loop then
  //        runs on the collected word→freq vocabulary, capped at 65,536
  //        entries by (freq desc, word) — the same bounded-driver-state
  //        contract as PQ's 65k training sample: real BPE trainers are
  //        exactly this shape (distributed counting, vocab-local merges),
  //        and the cap line is deterministic. Rows-only by nature (the
  //        loop is stateful — not one SQL); determinism pinned by the
  //        (−n, left, right) argmax tiebreak.
  def bpeMergeRounds(vocab: Seq[(String, Long)], rounds: Int)
      : Seq[(Int, String, String, Long)] = {
    var words = vocab.map { case (w, f) => (w.map(_.toString).toVector, f) }
    val out = Seq.newBuilder[(Int, String, String, Long)]
    var r = 1
    var go = true
    while (go && r <= rounds) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      words.foreach { case (syms, f) =>
        var i = 0
        while (i + 1 < syms.length) {
          val k = (syms(i), syms(i + 1))
          counts(k) = counts.getOrElse(k, 0L) + f
          i += 1
        }
      }
      if (counts.isEmpty) go = false
      else {
        val ((l, rr), n) = counts.toSeq
          .minBy { case ((a, b), c) => (-c, a, b) }
        words = words.map { case (syms, f) =>
          val merged = Vector.newBuilder[String]
          var i = 0
          while (i < syms.length) {
            if (i + 1 < syms.length && syms(i) == l && syms(i + 1) == rr) {
              merged += (l + rr); i += 2
            } else { merged += syms(i); i += 1 }
          }
          (merged.result(), f)
        }
        out += ((r, l, rr, n))
        r += 1
      }
    }
    out.result()
  }

  def q118(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val vocab = documents(s, dir)
      .select(explode(
        expr("regexp_extract_all(lower(text), '[a-z0-9]+', 0)")).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("freq"))
      .orderBy(col("freq").desc, col("w")).limit(65536)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    bpeMergeRounds(vocab, rounds = 10)
      .toDF("merge_rank", "left", "right", "n")
      .select(col("merge_rank").cast("bigint").as("merge_rank"),
        col("left"), col("right"), col("n"))
      .orderBy(col("merge_rank"))
  }

  // ── q119: distribution DRIFT between the deterministic train and val
  //        splits (q97's salted-sha split expression) — smoothed KL
  //        contribution per token, top-10. The check a mixture designer
  //        runs before trusting a val set: which tokens' train-vs-val
  //        probabilities diverge most. One token-domain groupBy with
  //        conditional per-split counts (q112's trick — the split never
  //        widens the exchange), 1-row totals broadcast back, shared-
  //        text float expression, TakeOrdered top-10.
  private val klContribExpr: String =
    "round(((a + 1.0) / (at + vs)) * " +
      "ln(((a + 1.0) / (at + vs)) / ((b + 1.0) / (bt + vs))) * 10000000) " +
      "/ 10000000.0"

  def q119(s: SparkSession, dir: String): DataFrame = {
    val st = documents(s, dir)
      .select(graft.ops.Scale.splitOf(col("doc_id").cast("string"))
          .as("split"),
        explode(expr("regexp_extract_all(lower(text), '[a-z0-9]+', 0)"))
          .as("t"))
      .where(col("split").isin("train", "val"))
      .groupBy(col("t"))
      .agg(count(when(col("split") === "train", 1)).as("a"),
        count(when(col("split") === "val", 1)).as("b"))
      .trackedPersist()
    val stats = st.agg(sum(col("a")).as("at"), sum(col("b")).as("bt"),
      count(lit(1)).as("vs"))
    st.crossJoin(broadcast(stats))
      .selectExpr("t AS token", "a AS n_train", "b AS n_val",
        s"$klContribExpr AS contrib")
      .orderBy(col("contrib").desc, col("token"))
      .limit(10)
  }

  val q119Sql: String =
    s"""WITH tok AS (
       |  SELECT CASE
       |      WHEN substring(sha256('split:' || CAST(doc_id AS VARCHAR)), 1, 2)
       |        < 'cc' THEN 'train'
       |      WHEN substring(sha256('split:' || CAST(doc_id AS VARCHAR)), 1, 2)
       |        < 'e6' THEN 'val'
       |      ELSE 'test' END AS split,
       |    unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS t
       |  FROM documents),
       |st AS (
       |  SELECT t, count(*) FILTER (WHERE split = 'train') AS a,
       |    count(*) FILTER (WHERE split = 'val') AS b
       |  FROM tok WHERE split IN ('train', 'val') GROUP BY 1),
       |g AS (
       |  SELECT CAST(sum(a) AS BIGINT) AS at, CAST(sum(b) AS BIGINT) AS bt,
       |    count(*) AS vs
       |  FROM st)
       |SELECT t AS token, a AS n_train, b AS n_val,
       |  $klContribExpr AS contrib
       |FROM st CROSS JOIN g
       |ORDER BY contrib DESC, token LIMIT 10""".stripMargin

  // ── q120: bigram-LM cross-entropy scoring — the CCNet-style quality
  //        filter (Wenzek et al. 2020): train an add-one-smoothed bigram
  //        language model on the deterministic q97 `train` split, score
  //        EVERY doc's mean negative log-likelihood under it, surface the
  //        top-20 most-surprising docs (the filter's drop candidates).
  //        Float discipline: each bigram's -ln(p) is rounded to a 1e-7
  //        fixed-point BIGINT and summed as INTEGERS, so the per-doc sum is
  //        order-independent and engine-exact (stronger than rounding the
  //        final avg — no float accumulation anywhere); the final xent is
  //        one exact-integer division. Scale shape: exchanges are keyed on
  //        the bigram/token domain (LM groupBy, score join) or doc_id (the
  //        per-doc sum) — all linear; vocab size is a 1-row broadcast; the
  //        top-20 is TakeOrderedAndProject, never a global sort.
  def q120(s: SparkSession, dir: String): DataFrame = {
    // persist the TOKEN-ARRAY stage (250k small rows at 50×), not the
    // exploded bigram stream (15M rows) — the regexp is the expensive
    // part worth caching; bigrams re-derive from it with a codegen'd
    // zip_with that never carries the whole array per exploded row
    val toks = fanout(documents(s, dir), "doc_id")
      .select(col("doc_id"),
        graft.ops.Scale.splitOf(col("doc_id").cast("string")).as("split"),
        expr("regexp_extract_all(lower(text), '[a-z0-9]+', 0)").as("a"))
      .trackedPersist()
    val big = toks
      .select(col("doc_id"), col("split"),
        explode(expr("zip_with(slice(a, 1, greatest(size(a) - 1, 0)), " +
          "slice(a, 2, greatest(size(a) - 1, 0)), " +
          "(x, y) -> struct(x AS w1, y AS w2))")).as("b"))
      .select(col("doc_id"), col("split"),
        col("b.w1").as("w1"), col("b.w2").as("w2"))
    val lm = big.where(col("split") === "train")
      .groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c"))
      .trackedPersist()
    val ctx = lm.groupBy(col("w1")).agg(sum(col("c")).as("ct"))
    val v = toks.where(col("split") === "train")
      .select(explode(col("a")).as("t"))
      .agg(countDistinct(col("t")).as("v"))
    big
      .join(lm, Seq("w1", "w2"), "left")
      .join(ctx, Seq("w1"), "left")
      .crossJoin(broadcast(v))
      .selectExpr("doc_id", "split",
        "CAST(round(-ln((coalesce(c, 0) + 1.0) / (coalesce(ct, 0) + v)) " +
          "* 10000000) AS BIGINT) AS nll")
      .groupBy(col("doc_id"), col("split"))
      .agg(count(lit(1)).as("n_bigrams"), sum(col("nll")).as("nll_e7"))
      .select(col("doc_id"), col("split"), col("n_bigrams"), col("nll_e7"),
        (col("nll_e7").cast("double") / col("n_bigrams") / lit(1e7))
          .as("xent"))
      .orderBy(col("xent").desc, col("doc_id"))
      .limit(20)
  }

  val q120Sql: String =
    """WITH d AS (
      |  SELECT doc_id,
      |    CASE WHEN substring(sha256('split:' || CAST(doc_id AS VARCHAR)), 1, 2)
      |        < 'cc' THEN 'train'
      |      WHEN substring(sha256('split:' || CAST(doc_id AS VARCHAR)), 1, 2)
      |        < 'e6' THEN 'val'
      |      ELSE 'test' END AS split,
      |    regexp_extract_all(lower(text), '[a-z0-9]+') AS a
      |  FROM documents),
      |b0 AS (SELECT doc_id, split, a,
      |  unnest(generate_series(1, len(a) - 1)) AS i FROM d),
      |b AS (SELECT doc_id, split, a[i] AS w1, a[i + 1] AS w2 FROM b0),
      |lm AS (SELECT w1, w2, count(*) AS c FROM b WHERE split = 'train'
      |  GROUP BY 1, 2),
      |ctx AS (SELECT w1, CAST(sum(c) AS BIGINT) AS ct FROM lm GROUP BY 1),
      |vt AS (SELECT count(DISTINCT t) AS v FROM (
      |  SELECT unnest(a) AS t FROM d WHERE split = 'train')),
      |sc AS (
      |  SELECT b.doc_id, b.split,
      |    CAST(round(-ln((coalesce(lm.c, 0) + 1.0)
      |      / (coalesce(ctx.ct, 0) + vt.v)) * 10000000) AS BIGINT) AS nll
      |  FROM b LEFT JOIN lm USING (w1, w2) LEFT JOIN ctx USING (w1)
      |  CROSS JOIN vt),
      |agg AS (
      |  SELECT doc_id, split, count(*) AS n_bigrams,
      |    CAST(sum(nll) AS BIGINT) AS nll_e7
      |  FROM sc GROUP BY 1, 2)
      |SELECT doc_id, split, n_bigrams, nll_e7,
      |  CAST(nll_e7 AS DOUBLE) / n_bigrams / 10000000.0 AS xent
      |FROM agg ORDER BY xent DESC, doc_id LIMIT 20""".stripMargin

  // ── q121: SINGLE-merge BPE application — apply q117's top merge pair to
  //        the corpus and report per-source compression. The mechanism
  //        oracle twin of q122 (greedy left-to-right non-overlapping
  //        `replace` IS the BPE per-pass merge semantic — 'aaa' under
  //        (a,a) → [aa, a], 2 pieces); with one merge the piece count is
  //        SQL-expressible: n_pieces(w) = len(w) − occurrences(w, l||r),
  //        occurrences via length-delta of replace. Scale shape: the top
  //        pair is a vocab-sized aggregate → 1-row broadcast; encoding is
  //        a narrow per-token map; one per-source groupBy. Integer sums,
  //        one shared-form rounded ratio.
  def q121(s: SparkSession, dir: String): DataFrame = {
    val vocab = fanout(documents(s, dir), "doc_id")
      .select(explode(
        expr("regexp_extract_all(lower(text), '[a-z0-9]+', 0)")).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("freq"))
    val nPairs = length(col("w")) - 1
    val top = vocab
      .select(col("w"), col("freq"),
        explode(when(nPairs < 1, array().cast("array<int>"))
          .otherwise(sequence(lit(1), nPairs))).as("i"))
      .select(expr("substring(w, i, 1)").as("l"),
        expr("substring(w, i + 1, 1)").as("r"), col("freq"))
      .groupBy(col("l"), col("r")).agg(sum(col("freq")).as("n"))
      .orderBy(col("n").desc, col("l"), col("r")).limit(1)
      .select(concat(col("l"), col("r")).as("p"))
    fanout(documents(s, dir), "doc_id")
      .select(col("source"),
        explode(expr("regexp_extract_all(lower(text), '[a-z0-9]+', 0)"))
          .as("w"))
      .crossJoin(broadcast(top))
      .selectExpr("source", "length(w) AS lw",
        "length(w) - (length(w) - length(replace(w, p, ''))) div 2 AS ns")
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_words"), sum(col("lw")).as("n_chars_tok"),
        sum(col("ns")).as("n_pieces"))
      .select(col("source"), col("n_words"), col("n_chars_tok"),
        col("n_pieces"),
        (round(col("n_chars_tok").cast("double") / col("n_pieces")
          * 10000) / 10000.0).as("compression"))
      .orderBy(col("source"))
  }

  // same oracle-only 4096 position bound as q117
  val q121Sql: String =
    """WITH tok AS (
      |  SELECT source, unnest(regexp_extract_all(lower(text), '[a-z0-9]+'))
      |    AS w
      |  FROM documents),
      |vocab AS (SELECT w, count(*) AS freq FROM tok GROUP BY 1),
      |pairs AS (
      |  SELECT substring(w, i, 1) AS l, substring(w, i + 1, 1) AS r, freq
      |  FROM vocab CROSS JOIN generate_series(1, 4096) t(i)
      |  WHERE i <= len(w) - 1),
      |top AS (SELECT l || r AS p FROM (
      |  SELECT l, r, sum(freq) AS n FROM pairs GROUP BY 1, 2
      |  ORDER BY n DESC, l, r LIMIT 1)),
      |enc AS (SELECT source, len(w) AS lw,
      |  len(w) - (len(w) - len(replace(w, p, ''))) // 2 AS ns
      |  FROM tok CROSS JOIN top)
      |SELECT source, count(*) AS n_words,
      |  CAST(sum(lw) AS BIGINT) AS n_chars_tok,
      |  CAST(sum(ns) AS BIGINT) AS n_pieces,
      |  round(CAST(sum(lw) AS DOUBLE) / sum(ns) * 10000) / 10000.0
      |    AS compression
      |FROM enc GROUP BY source ORDER BY source""".stripMargin

  // ── q122: FULL BPE tokenizer application — encode the corpus under the
  //        q118-induced merge table and report per-source piece counts /
  //        compression: the "tokenize the dataset with the learned vocab"
  //        step every training build runs after vocabulary induction.
  //        Spark-first shape with NO UDFs: the merge loop is applied only
  //        to the DISTINCT frequency-weighted vocabulary (the q117/q30
  //        collapse — corpus-size-independent), where each word is wrapped
  //        into a -delimited symbol string ('ab' → ␟a␟␟b␟) so that a
  //        chain of plain codegen'd `replace` calls — one per merge, built
  //        by a Scala fold — performs exact greedy BPE passes (full
  //        marker wrapping means adjacent matches share no characters,
  //        unlike space-separated forms); the piece count falls out as
  //        (final_length − word_length) div 2 because every piece carries
  //        exactly two markers. Encoded vocab then joins back to the
  //        (source, word) count table on the word key. Rows-only by
  //        nature (the merge table is corpus-derived driver state, q118's
  //        bounded-65k contract); QueriesSpec pins rounds=1 ≡ q121 and
  //        hand-computed encodings.
  def bpeEncodeStats(s: SparkSession, dir: String, rounds: Int): DataFrame = {
    val wordsOf = expr("regexp_extract_all(lower(text), '[a-z0-9]+', 0)")
    val capped = fanout(documents(s, dir), "doc_id")
      .select(explode(wordsOf).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("freq"))
      .orderBy(col("freq").desc, col("w")).limit(65536)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    val merges = bpeMergeRounds(capped, rounds).map { case (_, l, r, _) =>
      (l, r)
    }
    val sw = fanout(documents(s, dir), "doc_id")
      .select(col("source"), explode(wordsOf).as("w"))
      .groupBy(col("source"), col("w")).agg(count(lit(1)).as("n"))
    val M = "\u001f" // marker char, never inside [a-z0-9]+ tokens
    val wrapped = regexp_replace(col("w"), "(.)", s"$M$$1$M")
    val encoded = merges.foldLeft(wrapped) { case (c, (l, r)) =>
      org.apache.spark.sql.functions.replace(
        c, lit(s"$M$l$M$M$r$M"), lit(s"$M${l + r}$M"))
    }
    sw
      .select(col("source"), col("n"), length(col("w")).as("lw"),
        ((length(encoded) - length(col("w"))) / 2).cast("long").as("ns"))
      .groupBy(col("source"))
      .agg(sum(col("n")).as("n_words"),
        sum(col("n") * col("lw")).as("n_chars_tok"),
        sum(col("n") * col("ns")).as("n_pieces"))
      .select(col("source"), col("n_words"), col("n_chars_tok"),
        col("n_pieces"),
        (round(col("n_chars_tok").cast("double") / col("n_pieces")
          * 10000) / 10000.0).as("compression"))
      .orderBy(col("source"))
  }

  def q122(s: SparkSession, dir: String): DataFrame =
    bpeEncodeStats(s, dir, rounds = 10)

  // ── q130: sliding-window chunker (RAG / embedding prep): 64-token
  //         chunks at stride 48 (16-token overlap), one row per chunk with
  //         its md5 content digest. Narrow per-doc work: the scan fans out
  //         (numbered fanout — compute-bound regexp stage), the per-doc
  //         chunk count is derived from the token count BEFORE the explode
  //         (nothing wide is cached), and `slice` re-reads the one token
  //         array per output row. No shuffle at all until the output sort.
  def q130(s: SparkSession, dir: String): DataFrame = {
    val size = 64; val stride = 48
    fanout(documents(s, dir), "doc_id")
      .select(col("doc_id"), tokens(col("text")).as("toks"))
      .withColumn("n_tokens", org.apache.spark.sql.functions.size(col("toks")).cast("long"))
      .filter(col("n_tokens") > 0)
      .withColumn("chunk_idx",
        explode(sequence(lit(0L), expr(s"(n_tokens + ${stride - 1}) DIV $stride - 1"))))
      .select(
        col("doc_id"), col("chunk_idx"),
        (col("chunk_idx") * stride + 1).as("start_tok"),
        least(col("n_tokens") - col("chunk_idx") * stride, lit(size.toLong)).as("n_chunk_tokens"),
        md5(concat_ws(" ",
          slice(col("toks"), (col("chunk_idx") * stride + 1).cast("int"), lit(size)))).as("chunk_md5"))
      .orderBy(col("doc_id"), col("chunk_idx"))
  }

  val q130Sql: String =
    """WITH t AS (
      |  SELECT doc_id, regexp_extract_all(text, '\S+') AS toks,
      |         len(regexp_extract_all(text, '\S+')) AS n_tokens
      |  FROM documents),
      |c AS (
      |  SELECT doc_id, toks, n_tokens,
      |         unnest(range(0, (n_tokens + 47) // 48)) AS chunk_idx
      |  FROM t WHERE n_tokens > 0)
      |SELECT doc_id, chunk_idx, chunk_idx * 48 + 1 AS start_tok,
      |  least(n_tokens - chunk_idx * 48, 64) AS n_chunk_tokens,
      |  md5(array_to_string(toks[(chunk_idx*48 + 1)::INT:(chunk_idx*48 + 64)::INT], ' ')) AS chunk_md5
      |FROM c ORDER BY doc_id, chunk_idx""".stripMargin

  // ── q133: linear quality-classifier application (fastText-style scorer
  //         with published integer weights): engineered count features per
  //         doc → long-form explode → broadcast join against the weight
  //         table → integer fixed-point logit (1e-4 units, BIGINT — no
  //         float accumulation) → threshold labels. The weight table is
  //         the "model artifact"; at 100 TB it broadcasts unchanged and
  //         scoring stays a map-only pass over the corpus.
  def q133(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val weights = Seq(
      ("bias", 20000L), ("tokens", 15L), ("stop", 400L),
      ("punct", -250L), ("digit", -120L), ("upper", -600L))
      .toDF("feature", "w")
    // counts from the same TextStatsExpr scan as qualityLogit — the "ONE
    // definition" contract this query's weight table mirrors (an r14
    // review caught q133 left on java-regex counts after the kernel
    // migration: its \b answers would diverge from both its own RE2
    // oracle and its q135/q139/q145 siblings on non-ASCII-adjacent text)
    val feats = fanout(documents(s, dir), "doc_id")
      .withColumn("_ts",
        org.apache.spark.sql.graft.TextStatsExpr.column(col("text")))
      .select(col("doc_id"), col("source"),
        explode(map(
          lit("bias"), lit(1L),
          lit("tokens"), element_at(col("_ts"), 1),
          lit("stop"), element_at(col("_ts"), 6),
          lit("punct"), element_at(col("_ts"), 7),
          lit("digit"), element_at(col("_ts"), 4),
          lit("upper"), element_at(col("_ts"), 5))))
      .toDF("doc_id", "source", "feature", "value")
    val scored = feats
      .join(broadcast(weights), Seq("feature"))
      .groupBy(col("doc_id"), col("source"))
      .agg(sum(col("value") * col("w")).as("logit_1e4"))
      .withColumn("label",
        when(col("logit_1e4") >= 40000L, "hi")
          .when(col("logit_1e4") >= 20000L, "mid")
          .otherwise("lo"))
    scored.groupBy(col("source"), col("label"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("logit_1e4")).as("sum_logit_1e4"),
        (sum(col("logit_1e4")) / count(lit(1))).as("mean_logit_1e4"))
      .orderBy(col("source"), col("label"))
  }

  val q133Sql: String =
    """WITH f AS (
      |  SELECT doc_id, source,
      |    len(regexp_extract_all(text, '\S+')) AS f_tokens,
      |    len(regexp_extract_all(text, '\b(the|a|of|and|to|in)\b')) AS f_stop,
      |    len(regexp_extract_all(text, '[.,!?;:]')) AS f_punct,
      |    len(regexp_extract_all(text, '[0-9]')) AS f_digit,
      |    len(regexp_extract_all(text, '\b[A-Z]{2,}\b')) AS f_upper
      |  FROM documents),
      |scored AS (
      |  SELECT doc_id, source,
      |    20000 + 15*f_tokens + 400*f_stop - 250*f_punct - 120*f_digit
      |      - 600*f_upper AS logit_1e4,
      |    CASE WHEN 20000 + 15*f_tokens + 400*f_stop - 250*f_punct
      |              - 120*f_digit - 600*f_upper >= 40000 THEN 'hi'
      |         WHEN 20000 + 15*f_tokens + 400*f_stop - 250*f_punct
      |              - 120*f_digit - 600*f_upper >= 20000 THEN 'mid'
      |         ELSE 'lo' END AS label
      |  FROM f)
      |SELECT source, label, count(*) AS n_docs,
      |  CAST(sum(logit_1e4) AS BIGINT) AS sum_logit_1e4,
      |  CAST(sum(logit_1e4) AS BIGINT) / count(*) AS mean_logit_1e4
      |FROM scored GROUP BY source, label ORDER BY source, label""".stripMargin

  // ── q135: token-budget data selection (quality-ranked top-p per
  //         source): rank each source's docs by the q133 fixed-point
  //         quality logit and keep the best docs until 30% of the
  //         source's token mass is selected (a doc is kept while the
  //         tokens BEFORE it are under budget, so the budget is always
  //         reached, never silently undershot). All integer arithmetic;
  //         the cumulative sum is a window PARTITIONED BY source — each
  //         source ranks independently, no global sort at any scale.
  def q135(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val d = fanout(documents(s, dir), "doc_id")
      .select(col("doc_id"), col("source"),
        regexp_count(col("text"), lit("[^\\t\\n\\f\\r ]+")).cast("long").as("n_tokens"),
        qualityLogit(col("text")).cast("long").as("logit_1e4"))
    val w = Window.partitionBy(col("source"))
      .orderBy(col("logit_1e4").desc, col("doc_id"))
    val all = Window.partitionBy(col("source"))
    d.withColumn("cum_before",
        coalesce(sum(col("n_tokens")).over(w.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn("total_tokens", sum(col("n_tokens")).over(all))
      .withColumn("budget", expr("(3 * total_tokens) DIV 10"))
      .withColumn("selected", (col("cum_before") < col("budget")).cast("int"))
      .groupBy(col("source"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("selected")).cast("long").as("n_selected"),
        sum(when(col("selected") === 1, col("n_tokens")).otherwise(0L)).as("sel_tokens"),
        max(col("budget")).as("budget_tokens"),
        min(when(col("selected") === 1, col("logit_1e4"))).as("min_sel_logit"))
      .orderBy(col("source"))
  }

  val q135Sql: String =
    """WITH d AS (
      |  SELECT doc_id, source,
      |    len(regexp_extract_all(text, '\S+')) AS n_tokens,
      |    20000 + 15*len(regexp_extract_all(text, '\S+'))
      |      + 400*len(regexp_extract_all(text, '\b(the|a|of|and|to|in)\b'))
      |      - 250*len(regexp_extract_all(text, '[.,!?;:]'))
      |      - 120*len(regexp_extract_all(text, '[0-9]'))
      |      - 600*len(regexp_extract_all(text, '\b[A-Z]{2,}\b')) AS logit_1e4
      |  FROM documents),
      |r AS (
      |  SELECT *,
      |    coalesce(CAST(sum(n_tokens) OVER (PARTITION BY source
      |      ORDER BY logit_1e4 DESC, doc_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT), 0) AS cum_before,
      |    CAST(sum(n_tokens) OVER (PARTITION BY source) AS BIGINT) AS total_tokens
      |  FROM d),
      |sel AS (
      |  SELECT *, (3 * total_tokens) // 10 AS budget,
      |    CASE WHEN cum_before < (3 * total_tokens) // 10 THEN 1 ELSE 0 END AS selected
      |  FROM r)
      |SELECT source, count(*) AS n_docs,
      |  CAST(sum(selected) AS BIGINT) AS n_selected,
      |  CAST(sum(CASE WHEN selected = 1 THEN n_tokens ELSE 0 END) AS BIGINT) AS sel_tokens,
      |  max(budget) AS budget_tokens,
      |  min(CASE WHEN selected = 1 THEN logit_1e4 END) AS min_sel_logit
      |FROM sel GROUP BY source ORDER BY source""".stripMargin

  // ── q138: chunk-level mixed-language detection — language drift WITHIN
  //         a document that doc-level language ID (q29) cannot see: chunk
  //         each doc with the q130 rule (64 tokens, stride 48), apply the
  //         q29 marker-argmax to every chunk, then per doc derive the
  //         majority chunk language (deterministic tie-break: count desc,
  //         then language code) and whether chunks disagree. Rolled up per
  //         actual corpus language. One exchange on (doc_id, predicted)
  //         after the narrow chunk explode; everything downstream reuses
  //         doc_id-prefix partitioning.
  def q138(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val chunks = fanout(documents(s, dir), "doc_id")
      .select(col("doc_id"), col("lang"), tokens(col("text")).as("toks"))
      .withColumn("n_tokens", org.apache.spark.sql.functions.size(col("toks")).cast("long"))
      .filter(col("n_tokens") > 0)
      .withColumn("chunk_idx",
        explode(sequence(lit(0L), expr("(n_tokens + 47) DIV 48 - 1"))))
      .select(col("doc_id"), col("lang"),
        concat_ws(" ",
          slice(col("toks"), (col("chunk_idx") * 48 + 1).cast("int"), lit(64)))
          .as("ctext"))
    val scored = chunks.withColumn("predicted", langPredicted(col("ctext")))
    val perPred = scored.groupBy(col("doc_id"), col("lang"), col("predicted"))
      .agg(count(lit(1)).as("n_chunks"))
    val w = Window.partitionBy(col("doc_id"))
      .orderBy(col("n_chunks").desc, col("predicted"))
    val perDoc = perPred
      .withColumn("rn", row_number().over(w))
      .groupBy(col("doc_id"), col("lang"))
      .agg(
        count(lit(1)).as("n_langs"),
        max(when(col("rn") === 1, col("predicted"))).as("majority"))
    perDoc.groupBy(col("lang"))
      .agg(
        count(lit(1)).as("n_docs"),
        count(when(col("n_langs") > 1, 1)).as("n_mixed"),
        count(when(col("majority") === "und", 1)).as("n_und_majority"))
      .orderBy(col("lang"))
  }

  val q138Sql: String =
    """WITH t AS (
      |  SELECT doc_id, lang, regexp_extract_all(text, '\S+') AS toks,
      |         len(regexp_extract_all(text, '\S+')) AS n_tokens
      |  FROM documents),
      |c AS (
      |  SELECT doc_id, lang,
      |    array_to_string(toks[(chunk_idx*48 + 1)::INT:(chunk_idx*48 + 64)::INT], ' ') AS ctext
      |  FROM (SELECT doc_id, lang, toks,
      |          unnest(range(0, (n_tokens + 47) // 48)) AS chunk_idx
      |        FROM t WHERE n_tokens > 0)),
      |scored AS (
      |  SELECT doc_id, lang,
      |    len(regexp_extract_all(ctext, '\b(the|a|is|of)\b')) AS s_en,
      |    len(regexp_extract_all(ctext, '\b(der|die|und|ist)\b')) AS s_de,
      |    len(regexp_extract_all(ctext, '\b(el|los|es|y)\b')) AS s_es,
      |    len(regexp_extract_all(ctext, '\b(le|les|est|et)\b')) AS s_fr,
      |    len(regexp_extract_all(ctext, '的|是')) AS s_zh
      |  FROM c),
      |pred AS (
      |  SELECT doc_id, lang,
      |    CASE WHEN s_en > 0 AND s_en >= greatest(s_de, s_es, s_fr, s_zh) THEN 'en'
      |         WHEN s_de > 0 AND s_de >= greatest(s_es, s_fr, s_zh) THEN 'de'
      |         WHEN s_es > 0 AND s_es >= greatest(s_fr, s_zh) THEN 'es'
      |         WHEN s_fr > 0 AND s_fr >= s_zh THEN 'fr'
      |         WHEN s_zh > 0 THEN 'zh'
      |         ELSE 'und' END AS predicted
      |  FROM scored),
      |per_pred AS (
      |  SELECT doc_id, lang, predicted, count(*) AS n_chunks
      |  FROM pred GROUP BY doc_id, lang, predicted),
      |per_doc AS (
      |  SELECT doc_id, lang, count(*) AS n_langs,
      |    max(CASE WHEN rn = 1 THEN predicted END) AS majority
      |  FROM (SELECT *, row_number() OVER (PARTITION BY doc_id
      |          ORDER BY n_chunks DESC, predicted) AS rn FROM per_pred)
      |  GROUP BY doc_id, lang)
      |SELECT lang, count(*) AS n_docs,
      |  count(CASE WHEN n_langs > 1 THEN 1 END) AS n_mixed,
      |  count(CASE WHEN majority = 'und' THEN 1 END) AS n_und_majority
      |FROM per_doc GROUP BY lang ORDER BY lang""".stripMargin

  // ── q141: content-defined chunking (CDC) — fixed-size chunking (q130)
  //         shifts every boundary after a single-token edit, so edited
  //         near-dup docs share no chunk digests; CDC places boundaries
  //         where the TOKEN's own hash gates (sha256 hex starts with
  //         '0'/'1', p = 1/8 → ~8-token mean chunk), so chunk identity
  //         survives local edits and chunk-level dedup actually fires
  //         across document revisions. Entirely narrow per-doc array work
  //         (boundary positions, span start/end arrays, one explode) —
  //         the only exchange is the final per-source aggregate; at
  //         100 TB this is a map-only pass plus one 20-row-out groupBy.
  //         sha256 is the engine-portable gate (same trick as q51/q53).
  def q141(s: SparkSession, dir: String): DataFrame = {
    val d = fanout(documents(s, dir), "doc_id")
      .select(col("doc_id"), col("source"), tokens(col("text")).as("toks"))
      .withColumn("n", org.apache.spark.sql.functions.size(col("toks")))
      .filter(col("n") > 0)
    // 1-based boundary positions; chunk k spans starts(k)..ends(k)
    // inclusive, with starts = 1 :: bpos+1 and ends = bpos :: n (the
    // empty tail after a final-token boundary drops via s <= e)
    val spans = d
      .withColumn("bpos",
        org.apache.spark.sql.functions.filter(
          transform(col("toks"), (t, i) =>
            when(substring(sha2(t, 256), 1, 1).isin("0", "1"), i + 1)
              .otherwise(lit(-1))),
          x => x > 0))
      .withColumn("starts",
        concat(array(lit(1)), transform(col("bpos"), p => p + 1)))
      .withColumn("ends", concat(col("bpos"), array(col("n"))))
      .withColumn("span", explode(
        org.apache.spark.sql.functions.filter(
          zip_with(col("starts"), col("ends"),
            (a, b) => struct(a.as("s"), b.as("e"))),
          p => p("s") <= p("e"))))
    val chunks = spans.select(col("doc_id"), col("source"),
      (col("span.e") - col("span.s") + 1).cast("long").as("chunk_tokens"),
      md5(concat_ws(" ",
        slice(col("toks"), col("span.s"), col("span.e") - col("span.s") + 1)))
        .as("chunk_md5"))
    chunks.groupBy(col("source"))
      .agg(
        count(lit(1)).as("n_chunks"),
        countDistinct(col("chunk_md5")).as("n_distinct_chunks"),
        sum(col("chunk_tokens")).as("sum_chunk_tokens"))
      .select(col("source"), col("n_chunks"), col("n_distinct_chunks"),
        col("sum_chunk_tokens"),
        ((col("n_chunks") - col("n_distinct_chunks")) * 10000L / col("n_chunks"))
          .as("dup_ratio_1e4"),
        (col("sum_chunk_tokens") * 10000L / col("n_chunks"))
          .as("mean_chunk_tokens_1e4"))
      .orderBy(col("source"))
  }

  val q141Sql: String =
    """WITH t AS (
      |  SELECT doc_id, source, regexp_extract_all(text, '\S+') AS toks,
      |         len(regexp_extract_all(text, '\S+')) AS n
      |  FROM documents),
      |b AS (
      |  SELECT doc_id, source, toks, n,
      |    [CAST(i AS INT) for i in range(1, n + 1)
      |       if substring(sha256(toks[CAST(i AS INT)]), 1, 1) IN ('0','1')] AS bpos
      |  FROM t WHERE n > 0),
      |spans AS (
      |  SELECT doc_id, source, toks,
      |    list_prepend(1, [p + 1 for p in bpos]) AS starts,
      |    list_append(bpos, CAST(n AS INT)) AS ends
      |  FROM b),
      |c AS (
      |  SELECT doc_id, source,
      |    ends[CAST(k AS INT)] - starts[CAST(k AS INT)] + 1 AS chunk_tokens,
      |    md5(array_to_string(toks[starts[CAST(k AS INT)]:ends[CAST(k AS INT)]], ' ')) AS chunk_md5
      |  FROM (SELECT *, unnest(range(1, len(starts) + 1)) AS k FROM spans)
      |  WHERE starts[CAST(k AS INT)] <= ends[CAST(k AS INT)])
      |SELECT source, count(*) AS n_chunks, count(DISTINCT chunk_md5) AS n_distinct_chunks,
      |  CAST(sum(chunk_tokens) AS BIGINT) AS sum_chunk_tokens,
      |  (count(*) - count(DISTINCT chunk_md5)) * 10000 / count(*) AS dup_ratio_1e4,
      |  CAST(sum(chunk_tokens) AS BIGINT) * 10000 / count(*) AS mean_chunk_tokens_1e4
      |FROM c GROUP BY source ORDER BY source""".stripMargin

  // ── q142: hybrid-retrieval rank fusion (RRF, k=60) — the step that
  //         combines a sparse BM25 list and a dense cosine list into one
  //         ranking (Cormack et al.'s reciprocal-rank fusion; what every
  //         hybrid retrieval stack runs after its two top-k's). Reuses
  //         the two oracle-green legs verbatim: q112's BM25 top-10 and
  //         q37's brute-force cosine top-10 (vec_id ≡ doc_id for embedded
  //         docs; a doc absent from one list simply gets no contribution
  //         from it). Fusion is a UNION of (id, 1/(60+rank)) contribution
  //         rows + one groupBy — with ≤2 addends per id, IEEE addition
  //         commutativity makes the sum order-free, so the double is
  //         engine-portable. Both legs are already top-10-bounded, so the
  //         fusion stage is O(k) regardless of corpus size.
  def q142(s: SparkSession, dir: String): DataFrame = {
    val wS = Window.orderBy(col("score").desc, col("doc_id"))
    val sparse = q112(s, dir)
      .withColumn("rank", row_number().over(wS).cast("long"))
      .select(col("doc_id"), lit("bm25").as("sys"), col("rank"))
    val wD = Window.orderBy(col("cos_sim").desc, col("vec_id"))
    val dense = graft.operators.Similarity.q37(s, dir)
      .withColumn("rank", row_number().over(wD).cast("long"))
      .select(col("vec_id").as("doc_id"), lit("cos").as("sys"), col("rank"))
    sparse.unionByName(dense)
      .groupBy(col("doc_id"))
      .agg(
        min(when(col("sys") === "bm25", col("rank"))).as("rank_bm25"),
        min(when(col("sys") === "cos", col("rank"))).as("rank_cos"),
        sum(lit(1.0) / (lit(60) + col("rank"))).as("rrf"))
      .select(col("doc_id"), col("rank_bm25"), col("rank_cos"),
        (round(col("rrf") * 1000000) / 1000000.0).as("rrf_score"))
      .orderBy(col("rrf_score").desc, col("doc_id"))
      .limit(10)
  }

  val q142Sql: String =
    s"""WITH sparse0 AS ($q112Sql),
       |sparse AS (
       |  SELECT doc_id, 'bm25' AS sys,
       |    row_number() OVER (ORDER BY score DESC, doc_id) AS rank
       |  FROM sparse0),
       |dense0 AS (
       |  WITH q AS (SELECT embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id = 0)
       |  SELECT vec_id,
       |    round(list_cosine_similarity(embedding::DOUBLE[], q.qv) * 10000) / 10000.0 AS cos_sim
       |  FROM embeddings, q WHERE vec_id <> 0
       |  ORDER BY cos_sim DESC, vec_id LIMIT 10),
       |dense AS (
       |  SELECT vec_id AS doc_id, 'cos' AS sys,
       |    row_number() OVER (ORDER BY cos_sim DESC, vec_id) AS rank
       |  FROM dense0),
       |u AS (SELECT * FROM sparse UNION ALL SELECT * FROM dense)
       |SELECT doc_id,
       |  min(CASE WHEN sys = 'bm25' THEN rank END) AS rank_bm25,
       |  min(CASE WHEN sys = 'cos' THEN rank END) AS rank_cos,
       |  round(sum(1.0 / (60 + rank)) * 1000000) / 1000000.0 AS rrf_score
       |FROM u GROUP BY doc_id
       |ORDER BY rrf_score DESC, doc_id LIMIT 10""".stripMargin

  // ── q145: quality-stratified deterministic downsampling — the
  //         "keep everything good, thin the mediocre, trace-sample the
  //         bad" pass (CCNet's head/middle/tail policy as a relational
  //         op). Label = the q133 fixed-point logit with q145-local cut
  //         points (23000/21200 — a sampling policy is tuned to its
  //         corpus' score distribution; q133's published 40000/20000
  //         cuts collapse this fixture into one band); keep-rates are
  //         hex-prefix-exact (hi 1, mid 1/2 via md5 first nibble < '8',
  //         lo 1/16 via < '1') so membership is a pure deterministic
  //         expression on (doc_id) — reproducible across engines, runs,
  //         and partitionings, and rerunning on an appended corpus never
  //         flips an old doc's verdict (the property random sampling
  //         loses). Map-only + one 60-row-out groupBy at any scale.
  def q145(s: SparkSession, dir: String): DataFrame = {
    val logit = qualityLogit(col("text"))
    val u = substring(md5(col("doc_id").cast("string")), 1, 1)
    fanout(documents(s, dir), "doc_id")
      .select(col("doc_id"), col("source"),
        regexp_count(col("text"), lit("[^\\t\\n\\f\\r ]+")).cast("long").as("n_tokens"),
        when(logit >= 23000L, "hi").when(logit >= 21200L, "mid")
          .otherwise("lo").as("label"),
        u.as("u"))
      .withColumn("kept",
        col("label") === "hi" ||
          (col("label") === "mid" && col("u") < "8") ||
          (col("label") === "lo" && col("u") < "1"))
      .groupBy(col("source"), col("label"))
      .agg(
        count(lit(1)).as("n_docs"),
        count(when(col("kept"), 1)).as("n_kept"),
        sum(col("n_tokens")).as("tok_docs"),
        sum(when(col("kept"), col("n_tokens")).otherwise(0L)).as("tok_kept"))
      .orderBy(col("source"), col("label"))
  }

  val q145Sql: String =
    """WITH scored AS (
      |  SELECT doc_id, source,
      |    len(regexp_extract_all(text, '\S+')) AS n_tokens,
      |    CASE WHEN 20000 + 15*len(regexp_extract_all(text, '\S+'))
      |              + 400*len(regexp_extract_all(text, '\b(the|a|of|and|to|in)\b'))
      |              - 250*len(regexp_extract_all(text, '[.,!?;:]'))
      |              - 120*len(regexp_extract_all(text, '[0-9]'))
      |              - 600*len(regexp_extract_all(text, '\b[A-Z]{2,}\b')) >= 23000 THEN 'hi'
      |         WHEN 20000 + 15*len(regexp_extract_all(text, '\S+'))
      |              + 400*len(regexp_extract_all(text, '\b(the|a|of|and|to|in)\b'))
      |              - 250*len(regexp_extract_all(text, '[.,!?;:]'))
      |              - 120*len(regexp_extract_all(text, '[0-9]'))
      |              - 600*len(regexp_extract_all(text, '\b[A-Z]{2,}\b')) >= 21200 THEN 'mid'
      |         ELSE 'lo' END AS label,
      |    substring(md5(CAST(doc_id AS VARCHAR)), 1, 1) AS u
      |  FROM documents),
      |k AS (
      |  SELECT *,
      |    (label = 'hi' OR (label = 'mid' AND u < '8')
      |      OR (label = 'lo' AND u < '1')) AS kept
      |  FROM scored)
      |SELECT source, label, count(*) AS n_docs,
      |  count(*) FILTER (WHERE kept) AS n_kept,
      |  CAST(sum(n_tokens) AS BIGINT) AS tok_docs,
      |  CAST(sum(CASE WHEN kept THEN n_tokens ELSE 0 END) AS BIGINT) AS tok_kept
      |FROM k GROUP BY source, label ORDER BY source, label""".stripMargin

  // ── generated DuckDB oracles for the BPE LOOP (q118/q122) — the last
  //        corpus-derived-state queries without a driver hash. The loop
  //        unrolls: round k's CTEs derive pair counts from round k−1's
  //        marker-wrapped piece strings (chr(31) around every piece — the
  //        EXACT representation bpeEncodeStats merges with, so DuckDB's
  //        left-to-right non-overlapping replace() reproduces the greedy
  //        merge bit-for-bit), pick the argmax pair with the engine's
  //        (n DESC, l, r) tie-break, and rewrite the strings. 10 rounds →
  //        10 CTE blocks, generated by one loop below.
  private def bpeMergeCtes(rounds: Int): String = {
    val M = "chr(31)"
    val sb = new StringBuilder
    sb ++= s"""WITH tk AS (
      |  SELECT unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS w
      |  FROM documents),
      |v0 AS (
      |  SELECT w, count(*) AS freq FROM tk GROUP BY w
      |  ORDER BY freq DESC, w LIMIT 65536),
      |s0 AS (
      |  SELECT w, freq,
      |    regexp_replace(w, '(.)', $M || '\\1' || $M, 'g') AS seq
      |  FROM v0)""".stripMargin
    for (k <- 1 to rounds) {
      sb ++= s""",
      |p$k AS (
      |  SELECT pieces[i] AS l, pieces[i + 1] AS r,
      |    CAST(sum(freq) AS BIGINT) AS n
      |  FROM (
      |    SELECT freq, pieces,
      |      unnest(generate_series(1, len(pieces) - 1)) AS i
      |    FROM (SELECT freq,
      |      string_split(substring(seq, 2, len(seq) - 2), $M || $M)
      |        AS pieces FROM s${k - 1}))
      |  GROUP BY 1, 2),
      |m$k AS (SELECT l, r, n FROM p$k ORDER BY n DESC, l, r LIMIT 1),
      |s$k AS (
      |  SELECT w, freq,
      |    CASE WHEN m.l IS NULL THEN seq
      |      ELSE replace(seq, $M || m.l || $M || $M || m.r || $M,
      |        $M || m.l || m.r || $M) END AS seq
      |  FROM s${k - 1} LEFT JOIN m$k m ON true)""".stripMargin
    }
    sb.toString
  }

  val q118Sql: String = bpeMergeCtes(10) + "\n" +
    (1 to 10).map(k =>
      s"""SELECT CAST($k AS BIGINT) AS merge_rank, l AS "left", """ +
        s"""r AS "right", n FROM m$k""")
      .mkString("\nUNION ALL\n") + "\nORDER BY merge_rank"

  val q122Sql: String = {
    val M = "chr(31)"
    val sw = s""",
      |sw AS (
      |  SELECT source, w, count(*) AS n FROM (
      |    SELECT source,
      |      unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS w
      |    FROM documents)
      |  GROUP BY 1, 2),
      |e0 AS (
      |  SELECT w, regexp_replace(w, '(.)', $M || '\\1' || $M, 'g') AS seq
      |  FROM (SELECT DISTINCT w FROM sw))""".stripMargin
    // LEFT JOIN ON true (not CROSS JOIN): when the corpus has fewer than
    // 10 learnable merges, m_k is EMPTY and a cross join would collapse
    // every later round — and the final result — to zero rows, while the
    // engine folds only the merges that exist. The NULL guard keeps the
    // piece strings unchanged through exhausted rounds, exactly like the
    // engine's early-stop.
    val enc = (1 to 10).map(k => s""",
      |e$k AS (
      |  SELECT w,
      |    CASE WHEN m.l IS NULL THEN seq
      |      ELSE replace(seq, $M || m.l || $M || $M || m.r || $M,
      |        $M || m.l || m.r || $M) END AS seq
      |  FROM e${k - 1} LEFT JOIN m$k m ON true)""".stripMargin).mkString
    bpeMergeCtes(10) + sw + enc + s"""
      |SELECT source, CAST(sum(n) AS BIGINT) AS n_words,
      |  CAST(sum(n * len(w)) AS BIGINT) AS n_chars_tok,
      |  CAST(sum(n * ((len(seq) - len(w)) // 2)) AS BIGINT) AS n_pieces,
      |  round(CAST(sum(n * len(w)) AS DOUBLE)
      |    / sum(n * ((len(seq) - len(w)) // 2)) * 10000) / 10000.0
      |    AS compression
      |FROM sw JOIN e10 USING (w)
      |GROUP BY source ORDER BY source""".stripMargin
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q145_quality_sample" -> q145,
    "q142_hybrid_rrf" -> q142,
    "q141_cdc_chunks" -> q141,
    "q130_chunk_overlap" -> q130,
    "q133_quality_logit" -> q133,
    "q135_token_budget" -> q135,
    "q138_mixed_lang" -> q138,
    "q120_lm_perplexity" -> q120,
    "q121_bpe_apply1" -> q121,
    "q122_bpe_encode" -> q122,
    "q118_bpe_merges" -> q118,
    "q119_split_drift" -> q119,
    "q117_bpe_pairs" -> q117,
    "q116_domain_tokens" -> q116,
    "q112_bm25_topk" -> q112,
    "q95_heavy_hitters" -> q95,
    "q102_length_histogram" -> q102,
    "q104_dataset_card" -> q104,
    "q28_text_stats" -> q28,
    "q76_tfidf_topk" -> q76,
    "q29_lang_id" -> q29,
    "q30_token_topk" -> q30,
    "q31_fingerprint" -> q31,
    "q45_quality_filter" -> q45,
    "q65_repetition_filter" -> q65)

  val oracle: Map[String, String] = Map(
    "q145_quality_sample" -> q145Sql,
    "q142_hybrid_rrf" -> q142Sql,
    "q141_cdc_chunks" -> q141Sql,
    "q130_chunk_overlap" -> q130Sql,
    "q133_quality_logit" -> q133Sql,
    "q135_token_budget" -> q135Sql,
    "q138_mixed_lang" -> q138Sql,
    "q120_lm_perplexity" -> q120Sql,
    "q121_bpe_apply1" -> q121Sql,
    "q118_bpe_merges" -> q118Sql,
    "q122_bpe_encode" -> q122Sql,
    "q119_split_drift" -> q119Sql,
    "q117_bpe_pairs" -> q117Sql,
    "q116_domain_tokens" -> q116Sql,
    "q112_bm25_topk" -> q112Sql,
    "q95_heavy_hitters" -> q95Sql,
    "q102_length_histogram" -> q102Sql,
    "q104_dataset_card" -> q104Sql,
    "q28_text_stats" -> q28Sql,
    "q29_lang_id" -> q29Sql,
    "q30_token_topk" -> q30Sql,
    "q31_fingerprint" -> q31Sql,
    "q45_quality_filter" -> q45Sql,
    "q65_repetition_filter" -> q65Sql,
    "q76_tfidf_topk" -> q76Sql)
}
