package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.OperatorCaches.TrackedDataset
import graft.Tables._

/** Near-dup CLUSTERING: connected components over a dup-pair edge list —
  * the step that turns pairwise near-dup evidence (q33/q51/q54/q60 shapes)
  * into deletable groups (keep one representative per cluster, drop the
  * rest). Reference analog: the dedup family's "which rows are the same
  * entity" step (itsmuriuki/airline_data_pipeline has only exact
  * drop_duplicates — clustering generalizes it to transitive near-dups).
  *
  * Algorithm: alternating large-star/small-star edge rewriting (Kiveris
  * et al., "Connected Components in MapReduce and Beyond", SoCC 2014) —
  * each round every node hooks its neighbors onto the minimum of its
  * neighborhood, which CONTRACTS the graph toward per-component stars in
  * O(log² n) rounds (O(log n) observed) whatever the diameter. Round-8
  * note: the previous min-label propagation converged in O(diameter)
  * rounds, which a near-dup CHAIN (chunk-overlap corpora build them: A
  * overlaps B overlaps C …) turns into a convergence failure at any
  * bounded round budget; a one-hop pointer jump was measured advancing
  * only ~2 hops/round on long structured cycles (see ClustersSpec's
  * branchy-graph test, which pins exactly that regime). Each half-round
  * is one aggregate + one equi-join + distinct; lineage is truncated per
  * round (localCheckpoint) so the plan does not grow with iterations,
  * and per-round shuffle volume is O(|E|) — never the transitive
  * closure.
  */
object Clusters {

  /** Connected components over an undirected edge list (id_a, id_b).
    * Returns (cluster, id) where cluster = min node id reachable — only
    * for nodes that appear in at least one edge (singletons are not dup
    * candidates and stay out of the result, matching what a dedup pass
    * needs). Deterministic: labels are ids, min is order-free.
    */
  def connectedComponents(edges: DataFrame, maxIter: Int = 20): DataFrame = {
    val s = edges.sparkSession
    // Checkpoint the DIRECTED edge list before mirroring it: the mirror
    // union would otherwise evaluate the caller's edge subtree twice —
    // once per branch — and that subtree is typically the expensive part
    // (q67 feeds the corpus-wide jaccard pair join here; the double
    // evaluation was ~40% of the whole query).
    val e0 = edges.select(col("id_a").cast("long").as("a"),
        col("id_b").cast("long").as("b"))
      .localCheckpoint(true)
    // Size the loop's shuffle width to the GRAPH, not the session: each
    // round is a handful of small jobs whose per-task scheduling cost
    // dominates when a few-thousand-edge graph is spread over the
    // session's partition count, while a 100 TB edge list still gets one
    // partition per ~500k edges up to the session cap. The count is a
    // cheap block scan of the already-checkpointed edge RDD.
    val p = math.max(1, math.min(s.sessionState.conf.numShufflePartitions,
      (2 * e0.count() / 500000L).toInt + 1))
    graft.ScopedConf.withShufflePartitions(s, p) {
      // Edges kept canonical as (hi, lo): larger endpoint first. Both
      // star steps emit (x, m) with m strictly smaller, so canonical form
      // is preserved for free after the initial normalization.
      //
      // large-star: every node u hooks its LARGER neighbors onto
      // m = min(Γ(u) ∪ {u}) — run over the bidirectional neighborhood.
      def largeStar(e: DataFrame): DataFrame = {
        val bi = e.select(col("hi").as("u"), col("lo").as("v"))
          .unionByName(e.select(col("lo").as("u"), col("hi").as("v")))
        val m = bi.groupBy(col("u"))
          .agg(min(col("v")).as("mn"))
          .select(col("u"), least(col("mn"), col("u")).as("m"))
        bi.join(m, Seq("u"))
          .filter(col("v") > col("u"))
          .select(col("v").as("hi"), col("m").as("lo"))
          .filter(col("hi") =!= col("lo")).distinct()
      }
      // small-star: every node u hooks its SMALLER neighbors (and itself)
      // onto the minimum of that smaller neighborhood.
      def smallStar(e: DataFrame): DataFrame = {
        val m = e.groupBy(col("hi")).agg(min(col("lo")).as("m"))
        e.join(m, Seq("hi"))
          .select(col("lo").as("hi"), col("m").as("lo"))
          .unionByName(m.select(col("hi"), col("m").as("lo")))
          .filter(col("hi") =!= col("lo")).distinct()
      }
      var e = e0.select(greatest(col("a"), col("b")).as("hi"),
          least(col("a"), col("b")).as("lo"))
        .filter(col("hi") =!= col("lo")).distinct()
        .repartition(p, col("hi")).localCheckpoint(true)
      // Per-round action budget (r17, guide §1/§2: a few-hundred-edge
      // graph is pure job-scheduling overhead): the checkpoint is LAZY —
      // the fixpoint count materializes it in the same job — and the
      // previous round's count is remembered instead of recounted, so a
      // round runs 2 jobs (count, except) instead of 4 (eager checkpoint,
      // 2 counts, except).
      var eCount = e.count()
      var converged = eCount == 0L
      var i = 0
      while (!converged && i < maxIter) {
        val next = smallStar(largeStar(e)).localCheckpoint(false)
        val nextCount = next.count()
        // fixpoint test: same edge multiset (counts equal + one-sided
        // except empty). Post-contraction edge sets are O(nodes) rows.
        converged = nextCount == eCount && next.except(e).isEmpty
        e = next
        eCount = nextCount
        i += 1
      }
      require(converged, s"connectedComponents did not converge in $maxIter rounds")
      // at the fixpoint the edges are per-component stars (child, root)
      // with root = the component minimum; roots label themselves
      e.select(col("hi").as("id"), col("lo").as("cluster"))
        .unionByName(e.select(col("lo").as("id"), col("lo").as("cluster")))
        .distinct()
        .select(col("cluster"), col("id"))
    }
  }

  /** Cluster representatives to KEEP and members to DROP: one row per
    * clustered doc with its verdict — the actionable output of near-dup
    * dedup. */
  def dedupClusters(edges: DataFrame): DataFrame =
    connectedComponents(edges)
      .withColumn("action",
        when(col("id") === col("cluster"), "keep").otherwise("drop"))

  /** CONTRACTED near-dup clustering — CC on the REP graph (one node per
    * unique text), labels then expanded to members. Output is identical
    * to connectedComponents over the member-expanded jaccard edge list:
    * a clone group is a clique whose min id IS its rep, and two groups
    * join one component iff their reps pair at the threshold, so the
    * member component's min id equals the rep component's label (reps
    * without inter edges keep their own id; singleton groups without
    * edges are not dup candidates and stay out, as before).
    *
    * This is the r8 100× rehearsal fix: the expanded edge list carries
    * O(Σ k_g²) clone-clique rows — 24.75M intra edges at 100-way clones
    * over sf10, which blew the 32-task execution pool inside CC — while
    * the contracted graph has one node per unique text (5k) whatever the
    * clone multiplicity. Same trick q148's incremental ledger already
    * uses; now the batch clustering queries share it.
    */
  def contractedDupClusters(groups: DataFrame, gram: Int,
      threshold: Double): DataFrame = {
    val repLabels = connectedComponents(
        Dedup.repJaccardEdges(groups, gram, threshold))
      .select(col("id").as("rep"), col("cluster").as("rep_cluster"))
    groups.select(col("rep"), col("members"))
      .join(repLabels, Seq("rep"), "left")
      .filter(size(col("members")) > 1 || col("rep_cluster").isNotNull)
      .select(coalesce(col("rep_cluster"), col("rep")).as("cluster"),
        explode(col("members")).as("id"))
  }

  // ── q67: near-dup clusters over the corpus-wide trigram-Jaccard pairs
  //        (q54's unblocked edge shape, jaccard ≥ 0.5) — transitive
  //        closure turns 897-style pair lists into per-cluster keep/drop
  //        verdicts, via the contracted rep graph. Oracle: DuckDB WITH
  //        RECURSIVE reachability (min root per node) over the
  //        member-expanded edges — the driver hash pins the equivalence
  //        of the contracted and expanded forms.
  def q67(s: SparkSession, dir: String): DataFrame = {
    val groups = Dedup.textGroups(documents(s, dir), "text", "doc_id")
    contractedDupClusters(groups, gram = 3, threshold = 0.5)
      .withColumn("action",
        when(col("id") === col("cluster"), "keep").otherwise("drop"))
      .select(col("cluster"), col("id").as("doc_id"), col("action"))
      .orderBy(col("cluster"), col("doc_id"))
  }

  /** Shared DuckDB CTE chain for the q67 edge+CC mechanism: corpus
    * trigram-Jaccard ≥ 0.5 edges → recursive min-label reachability —
    * ends with `rec(id, cluster)`, one row per clustered doc. q67/q139/
    * q149 compose their final SELECT (or further CTEs) onto this single
    * definition so the clustering oracle has exactly one source of truth. */
  private val ccCtes: String =
    """WITH toks AS (
      |  SELECT doc_id, regexp_extract_all(text, '\S+') AS toks FROM documents),
      |sh AS (
      |  SELECT DISTINCT doc_id, t FROM (
      |    SELECT doc_id, unnest(CASE WHEN len(toks) < 3 THEN [array_to_string(toks, ' ')]
      |      ELSE [array_to_string(toks[CAST(i AS INT):CAST(i AS INT)+2], ' ')
      |            for i in range(1, len(toks) - 1)] END) AS t FROM toks)),
      |sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
      |pairs AS (
      |  SELECT x.doc_id AS id_a, y.doc_id AS id_b, count(*) AS shared
      |  FROM sh x JOIN sh y ON x.t = y.t AND x.doc_id < y.doc_id GROUP BY 1,2),
      |edges AS (
      |  SELECT id_a, id_b FROM pairs
      |  JOIN sizes sa ON id_a = sa.doc_id
      |  JOIN sizes sb ON id_b = sb.doc_id
      |  WHERE shared / (sa.n + sb.n - shared) >= 0.5),
      |bi AS (SELECT id_a AS a, id_b AS b FROM edges
      |       UNION ALL SELECT id_b, id_a FROM edges),
      |nodes AS (SELECT DISTINCT a AS id FROM bi),
      |rec AS (
      |  WITH RECURSIVE reach(id, root) AS (
      |    SELECT id, id FROM nodes
      |    UNION
      |    SELECT bi.b, r.root FROM reach r
      |    JOIN bi ON bi.a = r.id AND r.root < bi.b)
      |  SELECT id, min(root) AS cluster FROM reach GROUP BY id)""".stripMargin

  val q67Sql: String = ccCtes +
    """
      |SELECT cluster, id AS doc_id,
      |  CASE WHEN id = cluster THEN 'keep' ELSE 'drop' END AS action
      |FROM rec ORDER BY cluster, doc_id""".stripMargin

  // ── q139: quality-aware cluster representatives — q67 keeps the
  //         min-id member per near-dup cluster, which is arbitrary; a
  //         training pipeline keeps the BEST member. Reuses q67's edge
  //         shape (corpus trigram-Jaccard ≥ 0.5 → connected components)
  //         and the q133 integer fixed-point quality logit, then picks
  //         argmax(logit, tie → min doc_id) per cluster via one
  //         max(struct) aggregate (no window, no second shuffle: the
  //         groupBy(cluster) both ranks and summarizes). Output is the
  //         per-cluster verdict card: representative, its quality, member
  //         count, and chars saved by dropping the rest. The label join
  //         back to documents is by doc_id — at 100 TB the cluster side
  //         is only clustered docs (a small fraction of the corpus), so
  //         that join broadcasts or shuffles the small side only.
  def q139(s: SparkSession, dir: String): DataFrame = {
    val docs = documents(s, dir)
    val labels = contractedDupClusters(
        Dedup.textGroups(docs, "text", "doc_id"), gram = 3, threshold = 0.5)
      .select(col("cluster"), col("id").as("doc_id"))
    // clustered docs are a small fraction of the corpus; checkpoint so the
    // rep-chars join below does not re-run the scan+join+regexp subtree
    val scored = labels.join(docs, Seq("doc_id"))
      .select(col("cluster"), col("doc_id"), col("n_chars"),
        graft.ops.TextQueries.qualityLogit(col("text")).as("logit_1e4"))
      .localCheckpoint(true)
    scored.groupBy(col("cluster"))
      .agg(
        max(struct(col("logit_1e4"), (-col("doc_id")).as("neg_id"))).as("best"),
        count(lit(1)).as("n_members"),
        sum(col("n_chars")).as("chars_total"))
      .select(col("cluster"),
        (-col("best.neg_id")).as("rep_doc"),
        col("best.logit_1e4").as("rep_logit_1e4"),
        col("n_members"),
        (col("n_members") - 1L).as("n_dropped"),
        col("chars_total"))
      .join(scored.select(col("doc_id").as("rep_doc"), col("n_chars").as("rep_chars")), Seq("rep_doc"))
      .select(col("cluster"), col("rep_doc"), col("rep_logit_1e4"),
        col("n_members"), col("n_dropped"),
        (col("chars_total") - col("rep_chars")).as("chars_dropped"))
      .orderBy(col("cluster"))
  }

  val q139Sql: String = ccCtes +
    """,
      |scored AS (
      |  SELECT r.cluster, d.doc_id, d.n_chars,
      |    20000 + 15*len(regexp_extract_all(text, '\S+'))
      |      + 400*len(regexp_extract_all(text, '\b(the|a|of|and|to|in)\b'))
      |      - 250*len(regexp_extract_all(text, '[.,!?;:]'))
      |      - 120*len(regexp_extract_all(text, '[0-9]'))
      |      - 600*len(regexp_extract_all(text, '\b[A-Z]{2,}\b')) AS logit_1e4
      |  FROM rec r JOIN documents d ON r.id = d.doc_id),
      |ranked AS (
      |  SELECT cluster, doc_id, n_chars, logit_1e4,
      |    row_number() OVER (PARTITION BY cluster
      |                       ORDER BY logit_1e4 DESC, doc_id) AS rn
      |  FROM scored),
      |agg AS (
      |  SELECT cluster, count(*) AS n_members,
      |    CAST(sum(n_chars) AS BIGINT) AS chars_total
      |  FROM scored GROUP BY cluster)
      |SELECT a.cluster, r.doc_id AS rep_doc,
      |  CAST(r.logit_1e4 AS BIGINT) AS rep_logit_1e4,
      |  a.n_members, a.n_members - 1 AS n_dropped,
      |  a.chars_total - r.n_chars AS chars_dropped
      |FROM agg a JOIN ranked r ON a.cluster = r.cluster AND r.rn = 1
      |ORDER BY a.cluster""".stripMargin

  // ── q143: dedup-funnel survivorship — the per-source retention card a
  //         pipeline run emits: doc/token counts at each cascade stage
  //         (raw → exact-dedup → near-dup-dedup). Exact stage keeps the
  //         min doc_id per sha256(text) (digest-only shuffle — text never
  //         moves); near-dup stage runs the q67 cluster mechanism over
  //         the exact survivors and drops non-representatives (anti-join
  //         on the small drop list). Per-stage rollups LEFT-join the base
  //         so a source that loses everything still reports 0, not a
  //         missing row. At 100 TB each stage is the already-audited
  //         shape (q32's digest groupBy, q67's banded pairs + CC); the
  //         funnel adds only three 20-row-out aggregates.
  def q143(s: SparkSession, dir: String): DataFrame = {
    val docs = documents(s, dir)
    // ONE regexp+digest pass over the corpus serves all three stage
    // rollups and the exact-dedup grouping; text itself is re-read (scan
    // pruned to the survivor semi-join) only where near-dup pairing
    // genuinely needs it.
    val proj = docs.select(col("doc_id"), col("source"),
        regexp_count(col("text"), lit("[^\\t\\n\\f\\r ]+")).cast("long").as("n_tokens"),
        sha2(col("text"), 256).as("digest"))
      .trackedPersist()
    val keepExact = Dedup.exactDedupIdsByDigest(proj, "digest", "doc_id")
    val s1 = proj.join(keepExact, Seq("doc_id"), "left_semi")
    val s1Text = docs.select(col("doc_id"), col("text"))
      .join(keepExact, Seq("doc_id"), "left_semi")
    val edges = Dedup.jaccardPairs(s1Text, "text", "doc_id", gram = 3)
      .filter(col("jaccard") >= 0.5)
      .select(col("id_a"), col("id_b"))
    val drops = dedupClusters(edges)
      .filter(col("action") === "drop")
      .select(col("id").as("doc_id"))
    val s2 = s1.join(drops, Seq("doc_id"), "left_anti")
    def roll(df: DataFrame, n: String, t: String): DataFrame =
      df.groupBy(col("source"))
        .agg(count(lit(1)).as(n), sum(col("n_tokens")).as(t))
    roll(proj, "n_docs", "tok_total")
      .join(roll(s1, "n_exact", "tok_exact"), Seq("source"), "left")
      .join(roll(s2, "n_neardup", "tok_neardup"), Seq("source"), "left")
      .select(col("source"), col("n_docs"), col("tok_total"),
        coalesce(col("n_exact"), lit(0L)).as("n_exact"),
        coalesce(col("tok_exact"), lit(0L)).as("tok_exact"),
        coalesce(col("n_neardup"), lit(0L)).as("n_neardup"),
        coalesce(col("tok_neardup"), lit(0L)).as("tok_neardup"))
      .orderBy(col("source"))
  }

  val q143Sql: String =
    """WITH d AS (
      |  SELECT doc_id, source, text,
      |    len(regexp_extract_all(text, '\S+')) AS n_tokens
      |  FROM documents),
      |ke AS (SELECT min(doc_id) AS doc_id FROM d GROUP BY sha256(text)),
      |s1 AS (SELECT d.* FROM d JOIN ke USING (doc_id)),
      |toks AS (
      |  SELECT doc_id, regexp_extract_all(text, '\S+') AS toks FROM s1),
      |sh AS (
      |  SELECT DISTINCT doc_id, t FROM (
      |    SELECT doc_id, unnest(CASE WHEN len(toks) < 3 THEN [array_to_string(toks, ' ')]
      |      ELSE [array_to_string(toks[CAST(i AS INT):CAST(i AS INT)+2], ' ')
      |            for i in range(1, len(toks) - 1)] END) AS t FROM toks)),
      |sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
      |pairs AS (
      |  SELECT x.doc_id AS id_a, y.doc_id AS id_b, count(*) AS shared
      |  FROM sh x JOIN sh y ON x.t = y.t AND x.doc_id < y.doc_id GROUP BY 1,2),
      |edges AS (
      |  SELECT id_a, id_b FROM pairs
      |  JOIN sizes sa ON id_a = sa.doc_id
      |  JOIN sizes sb ON id_b = sb.doc_id
      |  WHERE shared / (sa.n + sb.n - shared) >= 0.5),
      |bi AS (SELECT id_a AS a, id_b AS b FROM edges
      |       UNION ALL SELECT id_b, id_a FROM edges),
      |nodes AS (SELECT DISTINCT a AS id FROM bi),
      |rec AS (
      |  WITH RECURSIVE reach(id, root) AS (
      |    SELECT id, id FROM nodes
      |    UNION
      |    SELECT bi.b, r.root FROM reach r
      |    JOIN bi ON bi.a = r.id AND r.root < bi.b)
      |  SELECT id, min(root) AS cluster FROM reach GROUP BY id),
      |drops AS (SELECT id AS doc_id FROM rec WHERE id <> cluster),
      |s2 AS (SELECT * FROM s1 WHERE doc_id NOT IN (SELECT doc_id FROM drops)),
      |base AS (
      |  SELECT source, count(*) AS n_docs,
      |    CAST(sum(n_tokens) AS BIGINT) AS tok_total
      |  FROM d GROUP BY source),
      |a1 AS (
      |  SELECT source, count(*) AS n_exact,
      |    CAST(sum(n_tokens) AS BIGINT) AS tok_exact
      |  FROM s1 GROUP BY source),
      |a2 AS (
      |  SELECT source, count(*) AS n_neardup,
      |    CAST(sum(n_tokens) AS BIGINT) AS tok_neardup
      |  FROM s2 GROUP BY source)
      |SELECT base.source, base.n_docs, base.tok_total,
      |  coalesce(a1.n_exact, 0) AS n_exact,
      |  coalesce(a1.tok_exact, 0) AS tok_exact,
      |  coalesce(a2.n_neardup, 0) AS n_neardup,
      |  coalesce(a2.tok_neardup, 0) AS tok_neardup
      |FROM base
      |LEFT JOIN a1 ON base.source = a1.source
      |LEFT JOIN a2 ON base.source = a2.source
      |ORDER BY base.source""".stripMargin

  // ── q147: the per-document LEDGER — the registry a production corpus
  //         pipeline materializes once per run and every downstream stage
  //         keys off: for EVERY doc its exact-dup representative (min id
  //         per sha256), its near-dup cluster (q67 mechanism; itself when
  //         unclustered), its quality label (q145 cuts), token count, and
  //         the final verdict (drop_dup → a smaller cluster member
  //         exists; drop_quality → surviving rep but 'lo' quality; keep).
  //         Unlike the q108 capstone (rows-only by design), every column
  //         here is engine-portable, so the WHOLE ledger is hash-oracled.
  //         Plan: the q143 single-projection discipline (one regexp+digest
  //         pass), cluster labels left-joined (small side), per-doc output
  //         — at 100 TB this is the one materialization whose cost the
  //         funnel/clusters/sampling queries already paid piecewise.
  def q147(s: SparkSession, dir: String): DataFrame = {
    val docs = documents(s, dir)
    val proj = docs.select(col("doc_id"), col("source"),
        regexp_count(col("text"), lit("[^\\t\\n\\f\\r ]+")).cast("long").as("n_tokens"),
        graft.ops.TextQueries.qualityLogit(col("text")).as("logit_1e4"))
      .trackedPersist()
    // ONE digest collapse serves both the exact-rep derivation and the
    // near-dup pairing (Dedup.textGroups is persisted)
    val groups = Dedup.textGroups(docs, "text", "doc_id")
    val exactRepPerDoc = groups
      .select(explode(col("members")).as("doc_id"), col("rep").as("exact_rep"))
    val labels = contractedDupClusters(groups, gram = 3, threshold = 0.5)
      .select(col("id").as("doc_id"), col("cluster"))
    proj.join(exactRepPerDoc, Seq("doc_id"))
      .join(labels, Seq("doc_id"), "left")
      .select(col("doc_id"), col("source"), col("n_tokens"),
        col("exact_rep"),
        coalesce(col("cluster"), col("doc_id")).as("dup_group"),
        when(col("logit_1e4") >= 23000L, "hi")
          .when(col("logit_1e4") >= 21200L, "mid").otherwise("lo").as("quality"),
        when(coalesce(col("cluster"), col("doc_id")) =!= col("doc_id"), "drop_dup")
          .when(col("logit_1e4") < 21200L, "drop_quality")
          .otherwise("keep").as("verdict"))
      .orderBy(col("doc_id"))
  }

  val q147Sql: String = ccCtes +
    """,
      |scored AS (
      |  SELECT doc_id, source,
      |    len(regexp_extract_all(text, '\S+')) AS n_tokens,
      |    sha256(text) AS digest,
      |    20000 + 15*len(regexp_extract_all(text, '\S+'))
      |      + 400*len(regexp_extract_all(text, '\b(the|a|of|and|to|in)\b'))
      |      - 250*len(regexp_extract_all(text, '[.,!?;:]'))
      |      - 120*len(regexp_extract_all(text, '[0-9]'))
      |      - 600*len(regexp_extract_all(text, '\b[A-Z]{2,}\b')) AS logit_1e4
      |  FROM documents),
      |er AS (SELECT digest, min(doc_id) AS exact_rep FROM scored GROUP BY digest)
      |SELECT s.doc_id, s.source, s.n_tokens, er.exact_rep,
      |  coalesce(r.cluster, s.doc_id) AS dup_group,
      |  CASE WHEN s.logit_1e4 >= 23000 THEN 'hi'
      |       WHEN s.logit_1e4 >= 21200 THEN 'mid' ELSE 'lo' END AS quality,
      |  CASE WHEN coalesce(r.cluster, s.doc_id) <> s.doc_id THEN 'drop_dup'
      |       WHEN s.logit_1e4 < 21200 THEN 'drop_quality'
      |       ELSE 'keep' END AS verdict
      |FROM scored s
      |JOIN er ON s.digest = er.digest
      |LEFT JOIN rec r ON s.doc_id = r.id
      |ORDER BY s.doc_id""".stripMargin

  // ── q148: INCREMENTAL ledger maintenance — q147 recomputed from
  //         scratch every run is the thing a 100 TB pipeline cannot
  //         afford; this is the delta form: given yesterday's near-dup
  //         cluster labels (here rebuilt from the doc_id%5≠0 "history"
  //         slice — in production they are read back from the previous
  //         ledger) and today's batch (doc_id%5=0), only batch-touching
  //         work is new: exact-group star edges for digest groups that
  //         gained a batch member, text-level Jaccard pairs where at
  //         least one side holds a batch doc, then connected components
  //         over the CONTRACTED graph (history clusters enter as single
  //         supernodes — contraction preserves connectivity, and min-id
  //         labels survive because a cluster's label is already its min
  //         member). The oracle is q147Sql VERBATIM: the driver hash
  //         proves incremental ≡ full recompute, the q127 contract at
  //         ledger scale.
  def q148(s: SparkSession, dir: String): DataFrame = {
    val docs = documents(s, dir)
    val isBatch = col("doc_id") % 5 === 0
    // yesterday's artifact: history cluster labels — READ from a persisted
    // parquet, as in production (the previous ledger run wrote them; q181's
    // band index follows the same Fixtures discipline). The build is a
    // deterministic function of the history slice, so the q147Sql hash
    // oracle still proves incremental ≡ full recompute — and the benched
    // cost is the operator's actual contract (delta work over an on-disk
    // artifact), not a from-scratch history reclustering per run.
    val histLabels = s.read.parquet(graft.Fixtures.path("ledgerhist", dir) {
        contractedDupClusters(
            Dedup.textGroups(docs.filter(col("doc_id") % 5 =!= 0),
              "text", "doc_id"), gram = 3, threshold = 0.5)
          .select(col("id").as("doc_id"), col("cluster"))
      }).trackedPersist()
    // today: digest groups over the merged corpus (global min-id reps),
    // flagged by batch membership — shared Dedup.textGroups stage
    val groups = Dedup.textGroups(docs, "text", "doc_id", Some(isBatch))
    // exact star edges only for groups that gained a batch member
    val exactEdges = groups.filter(col("has_flag"))
      .select(col("rep"), explode(col("members")).as("id"))
      .filter(col("id") =!= col("rep"))
      .select(col("rep").as("id_a"), col("id").as("id_b"))
    // text-level near-dup pairs with >=1 batch-holding side (the only
    // pairs the history run could not have seen) — shared mechanism
    val crossPairs = Dedup.crossJaccardEdges(groups, gram = 3, threshold = 0.5)
    // contract new edges through yesterday's labels; CC over supernodes
    val contracted = exactEdges.unionByName(crossPairs)
      .join(histLabels.select(col("doc_id").as("id_a"), col("cluster").as("ca")),
        Seq("id_a"), "left")
      .join(histLabels.select(col("doc_id").as("id_b"), col("cluster").as("cb")),
        Seq("id_b"), "left")
      .select(coalesce(col("ca"), col("id_a")).as("id_a"),
        coalesce(col("cb"), col("id_b")).as("id_b"))
      .filter(col("id_a") =!= col("id_b"))
    val comp = connectedComponents(contracted)
    // expand supernodes back to docs
    val histClusterIds = histLabels.select(col("cluster")).distinct()
    val touched = comp.join(
        histLabels.select(col("cluster").as("id"), col("doc_id")), Seq("id"))
      .select(col("doc_id"), col("cluster"))
    val direct = comp
      .join(histClusterIds.withColumnRenamed("cluster", "id"), Seq("id"), "left_anti")
      .select(col("id").as("doc_id"), col("cluster"))
    val untouched = histLabels
      .join(comp.select(col("id").as("cluster")).distinct(), Seq("cluster"), "left_anti")
      .select(col("doc_id"), col("cluster"))
    val finalLabels = touched.unionByName(direct).unionByName(untouched)
    // ledger assembly, exactly q147's shape
    val proj = docs.select(col("doc_id"), col("source"),
      regexp_count(col("text"), lit("[^\\t\\n\\f\\r ]+")).cast("long").as("n_tokens"),
      graft.ops.TextQueries.qualityLogit(col("text")).as("logit_1e4"))
    val exactRepPerDoc = groups
      .select(explode(col("members")).as("doc_id"), col("rep").as("exact_rep"))
    proj.join(exactRepPerDoc, Seq("doc_id"))
      .join(finalLabels, Seq("doc_id"), "left")
      .select(col("doc_id"), col("source"), col("n_tokens"),
        col("exact_rep"),
        coalesce(col("cluster"), col("doc_id")).as("dup_group"),
        when(col("logit_1e4") >= 23000L, "hi")
          .when(col("logit_1e4") >= 21200L, "mid").otherwise("lo").as("quality"),
        when(coalesce(col("cluster"), col("doc_id")) =!= col("doc_id"), "drop_dup")
          .when(col("logit_1e4") < 21200L, "drop_quality")
          .otherwise("keep").as("verdict"))
      .orderBy(col("doc_id"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q67_neardup_clusters" -> q67,
    "q139_cluster_best" -> q139,
    "q143_dedup_funnel" -> q143,
    "q147_doc_ledger" -> q147,
    "q148_ledger_delta" -> q148)

  val oracle: Map[String, String] = Map(
    "q67_neardup_clusters" -> q67Sql,
    "q139_cluster_best" -> q139Sql,
    "q143_dedup_funnel" -> q143Sql,
    "q147_doc_ledger" -> q147Sql,
    // the incremental path must hash-match the FULL recompute
    "q148_ledger_delta" -> q147Sql)
}
