package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.FormattedMode
import org.apache.spark.sql.functions.col

/** Physical-plan property assertions — the scale contract (SURVEY.md §4):
  * filters/projections reach the parquet scan, top-k never full-sorts,
  * bounded dims broadcast, existence checks stay semi/anti. A regression
  * here is a performance bug even while results stay correct. */
class PlanSpec extends SparkTestBase {

  private def plan(df: DataFrame): String = {
    // other suites may have cached overlapping frames; plan assertions are
    // about the cold parquet path
    spark.catalog.clearCache()
    df.queryExecution.explainString(FormattedMode)
  }

  test("q01: ship-date filter and column pruning reach the parquet scan") {
    val p = plan(graft.ops.RefQueries.q01(spark, sfDir))
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate"), p)
    assert(!p.contains("l_orderkey"), "q01 must not read unused columns")
  }

  test("q04/q06: top-k compiles to TakeOrderedAndProject, not a global sort") {
    val p4 = plan(graft.ops.RefQueries.q04(spark, sfDir))
    assert(p4.contains("TakeOrderedAndProject"), p4)
    val p6 = plan(graft.ops.RefQueries.q06(spark, sfDir))
    assert(p6.contains("TakeOrderedAndProject"), p6)
  }

  test("q08: pagination pushes date range + status into the scan and takes top-100") {
    val p = plan(graft.ops.RefQueries.q08(spark, sfDir))
    assert(p.contains("TakeOrderedAndProject"), p)
    assert(p.contains("EqualTo(o_orderstatus,O)"), p)
    assert(p.contains("GreaterThanOrEqual(o_orderdate"), p)
  }

  test("q16/q20: dimension joins broadcast") {
    val p16 = plan(graft.ops.Joins.q16(spark, sfDir))
    assert(p16.contains("BroadcastHashJoin"), p16)
    val p20 = plan(graft.ops.Joins.q20(spark, sfDir))
    assert(p20.split("BroadcastHashJoin").length >= 4,
      "q20 star join must broadcast the three dim edges\n" + p20)
  }

  test("q18/q19: existence checks stay semi/anti joins") {
    assert(plan(graft.ops.Joins.q18(spark, sfDir)).contains("LeftSemi"))
    assert(plan(graft.ops.Joins.q19(spark, sfDir)).contains("LeftAnti"))
  }

  test("q11: pure projection plans with no hash shuffle, only the output range sort") {
    val p = plan(graft.ops.RefQueries.q11(spark, sfDir))
    assert(!p.contains("hashpartitioning"), p)
    assert(p.contains("rangepartitioning"), p)
  }

  test("q17 degrades to sort-merge join when broadcast is unavailable (100 TB shape)") {
    val key = "spark.sql.autoBroadcastJoinThreshold"
    val old = spark.conf.get(key)
    try {
      spark.conf.set(key, "-1")
      val p = plan(graft.ops.Joins.q17(spark, sfDir))
      assert(p.contains("SortMergeJoin"), p)
    } finally spark.conf.set(key, old)
  }

  test("q37: brute-force ANN broadcasts the query vector, scans corpus once") {
    val p = plan(graft.operators.Similarity.q37(spark, sfDir))
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"), p)
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("q38: LSH bucketing runs as one fused srp_signature expression") {
    val p = plan(graft.operators.Similarity.q38(spark, sfDir))
    assert(p.contains("srp_signature"), p)
    // no interpreted per-plane HOF folds left in the bucketing path
    assert(!p.contains("aggregate(zip_with"), p)
  }

  test("q98: fixed-point PQ runs fused int_codes + adc_score kernels, " +
    "pool cut by TopKPerKey — no interpreted folds, no cartesian") {
    val p = plan(graft.operators.Similarity.q98(spark, sfDir))
    assert(p.contains("int_codes"), p)
    assert(p.contains("adc_score"), p)
    assert(p.contains("TopKPerKey"), p)
    assert(!p.contains("aggregate(zip_with"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q41: integer centroid sums are one aggregate — the only explode " +
    "is the bounded probe×label frame, nothing re-assembles with collect_list") {
    val df = graft.operators.Similarity.q41(spark, sfDir)
    val p = plan(df)
    assert(!p.contains("collect_list"), p)
    assert(!p.contains("CartesianProduct"), p)
    // exactly one Generate: the probe-side posexplode over queries×labels
    // (bounded); a corpus-side explode would mean the n·dim shuffle came back
    val gens = df.queryExecution.sparkPlan.collect {
      case g: org.apache.spark.sql.execution.GenerateExec => g
    }
    assert(gens.size <= 1, gens.mkString("\n"))
  }

  test("q55/q128: fixed-point IVF assignment is the fused int_codes " +
    "kernel, probes broadcast — no cartesian, no retraining in q128") {
    for (q <- Seq(graft.operators.Similarity.q55 _,
        graft.operators.Similarity.q128 _)) {
      val p = plan(q(spark, sfDir))
      assert(p.contains("BroadcastExchange"), p)
      assert(!p.contains("CartesianProduct"), p)
    }
    // the training-side assignment kernel is in q55's plan; q128's query
    // path only scans its artifacts (the probe explode is query-side)
    assert(plan(graft.operators.Similarity.q55(spark, sfDir))
      .contains("int_codes"))
  }

  test("q158: every audit leg keeps its fused kernels (srp_signature, " +
    "int_codes, adc_score) and the TopKPerKey pool cut — no cartesian") {
    val p = plan(graft.operators.Similarity.q158(spark, sfDir))
    assert(p.contains("srp_signature"), p)
    assert(p.contains("int_codes"), p)
    assert(p.contains("adc_score"), p)
    assert(p.contains("TopKPerKey"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q52: hash-ranked exact-n sample compiles to TakeOrderedAndProject") {
    val p = plan(graft.ops.RefQueries.q52(spark, sfDir))
    assert(p.contains("TakeOrderedAndProject"), p)
    assert(!p.contains("Exchange rangepartitioning"),
      "global sort would not survive 100 TB: " + p)
  }

  test("q60/q53 winnowing: gram hashing is never inlined into a Filter") {
    // The InferFiltersFromGenerate trap (PLANS.md rounds 2-3): exploding a
    // hash-built array pushes `size(arr) > 0` to the scan with the whole
    // hash expression inlined — every gram hashed twice (or, with a window
    // lambda, O(n²)). The position-explode shape keeps crypto out of every
    // Filter; this pins it.
    for (q <- Seq(graft.operators.Dedup.q60(spark, sfDir),
        graft.operators.Dedup.q53(spark, sfDir))) {
      val opt = q.queryExecution.optimizedPlan.toString
      val offending = opt.linesIterator
        .filter(l => l.contains("Filter ") && l.contains("sha2("))
      assert(offending.isEmpty,
        "sha2 inside a Filter means duplicated gram hashing:\n" +
          offending.mkString("\n"))
    }
  }

  test("q68: PII redaction is one shuffle-free codegen'd projection") {
    val q = graft.ops.Redact.q68(spark, sfDir)
    val exec = q.queryExecution.executedPlan.toString
    // only the output ORDER BY may exchange; the scrub itself must not
    assert(!exec.contains("hashpartitioning"),
      s"redaction projection must not hash-shuffle:\n$exec")
    val opt = q.queryExecution.optimizedPlan.toString
    assert(!opt.linesIterator.exists(l =>
      l.contains("Filter ") && l.contains("regexp")), opt)
  }

  test("q69: chunk text is derived after the Generate, never in a Filter") {
    // same InferFiltersFromGenerate discipline as q60/q53: the inferred
    // size() filter must inline only the cheap position sequence, not the
    // chunk-assembly (slice + array_join) expression
    val opt = graft.operators.Dedup.q69(spark, sfDir)
      .queryExecution.optimizedPlan.toString
    val offending = opt.linesIterator
      .filter(l => l.contains("Filter ") && l.contains("array_join("))
    assert(offending.isEmpty,
      "array_join inside a Filter means duplicated chunk assembly:\n" +
        offending.mkString("\n"))
  }

  test("q61: SRP twin pairs via equi-joins only — no cartesian fallback") {
    val p = plan(graft.operators.Similarity.q61(spark, sfDir))
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("q185: banded twin runs ONE fused signature pass, equi-joins only") {
    val p = plan(graft.operators.Similarity.q185(spark, sfDir))
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
    // signatures come from the fused codegen expression (not a HOF chain);
    // the band join sees (band, sig, rep) only — vectors re-attach post-join
    assert(p.contains("srp_signature"), p)
    assert(p.contains("TakeOrderedAndProject"),
      "top-100 must compile to TakeOrderedAndProject, not a global sort\n" + p)
  }

  test("q73: as-of join is one key shuffle + window — no join operator at all") {
    val p = plan(graft.ops.TemporalJoins.q73(spark, sfDir))
    assert(p.contains("Window"), p)
    assert(!p.contains("Join"), "as-of must rewrite to union+window, not a join\n" + p)
  }

  test("q74: range join keeps its equi keys — hash/SMJ with a residual, never NLJ") {
    val p = plan(graft.ops.TemporalJoins.q74(spark, sfDir))
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"), p)
    assert(p.contains("HashJoin") || p.contains("SortMergeJoin"), p)
  }

  test("q75: four scalar percentile calls fuse to one buffer (MergePercentiles)") {
    import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Percentile}
    val df = graft.ops.Stats.q75(spark, sfDir)
    val buffers = df.queryExecution.optimizedPlan
      .collect { case n => n.expressions }.flatten
      .flatMap(_.collect {
        case ae: AggregateExpression
            if ae.aggregateFunction.isInstanceOf[Percentile] => ae.resultId
      }).distinct.size
    assert(buffers == 1, df.queryExecution.optimizedPlan)
  }

  test("q77: centroid matrix reduces vectors in one aggregate, pairs via broadcast") {
    val p = plan(graft.operators.Similarity.q77(spark, sfDir))
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("q140: probe set broadcasts; the corpus scan is never re-shuffled pre-rank") {
    val p = plan(graft.operators.Similarity.q140(spark, sfDir))
    assert(p.contains("BroadcastNestedLoopJoin"), p)
    // exactly the per-query rank exchange (qid) + the output range sort
    assert(p.split("hashpartitioning").length - 1 == 1, p)
  }

  test("q141: CDC chunking is narrow until the per-source aggregate") {
    val p = plan(graft.ops.TextQueries.q141(spark, sfDir))
    assert(!p.contains("Join"), p)
    // the numbered-fanout repartition + distinct-agg (source, chunk_md5)
    // + final (source) re-shuffle only
    assert(p.split("hashpartitioning").length - 1 <= 3, p)
  }

  test("q142: both fusion legs stay top-k (TakeOrderedAndProject), never a full sort") {
    val p = plan(graft.ops.TextQueries.q142(spark, sfDir))
    assert(p.split("TakeOrderedAndProject").length >= 3,
      "both legs must take top-10 before fusion\n" + p)
  }

  test("q144: novelty shuffles carry the md5 digest, and the gram join is an equi join") {
    val p = plan(graft.operators.Dedup.q144(spark, sfDir))
    assert(p.contains("hashpartitioning(g#") || p.contains("hashpartitioning(g,"), p)
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("q145: stratified sampling is map-only + one aggregate exchange") {
    val p = plan(graft.ops.TextQueries.q145(spark, sfDir))
    assert(!p.contains("Join"), p)
    // the numbered-fanout repartition + the one aggregate exchange
    assert(p.split("hashpartitioning").length - 1 == 2, p)
  }

  test("q157: full-outer reconciliation aggregates BOTH sides before the join") {
    val q = graft.ops.Joins.q157(spark, sfDir)
    val exec = q.queryExecution.executedPlan.toString
    assert(exec.contains("FullOuter"), exec)
    // the join must consume two aggregates, never a raw fact side: in the
    // optimized plan both join children are Aggregates
    val opt = q.queryExecution.optimizedPlan
    val join = opt.collectFirst {
      case j: org.apache.spark.sql.catalyst.plans.logical.Join => j
    }.get
    def isAgg(p: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan) =
      p.collectFirst {
        case a: org.apache.spark.sql.catalyst.plans.logical.Aggregate => a
      }.nonEmpty
    assert(isAgg(join.left) && isAgg(join.right),
      "both full-outer inputs must be pre-aggregated:\n" + opt)
  }

  test("multi-probe LSH: probe expansion is query-side; probe set broadcasts") {
    val e = Tables.embeddings(spark, sfDir)
      .withColumn("v", col("embedding").cast("array<double>"))
      .select(col("vec_id"), col("v"), col("label"))
    val probes = e.filter(col("vec_id") < 5)
      .select(col("vec_id").as("qid"), col("v").as("qv"))
    val p = plan(graft.operators.Similarity.annLshMultiProbe(e, probes, 5, 9))
    // the corpus side computes ONE fused signature pass (srp_signature),
    // and the expanded probe set reaches the bucket join as a broadcast —
    // the corpus is never shuffled for the probe ring
    assert(p.contains("srp_signature"), p)
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastExchange"), p)
  }

  test("q167/q168/q170: media payloads never shuffle — decode is pre-exchange") {
    // every Exchange in the media dedup/manifest plans carries only
    // scalar fingerprint columns; the binary payload column dies at the
    // decode map, before any shuffle
    Seq(graft.operators.Video.q167(spark, sfDir),
        graft.operators.Multimodal.q168(spark, sfDir),
        graft.operators.Multimodal.q170(spark, sfDir)).foreach { q =>
      // exchanges exist only post-EnsureRequirements; under AQE that tree
      // is the adaptive plan's initialPlan
      val exec = q.queryExecution.executedPlan match {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          a.initialPlan
        case p => p
      }
      val exchanges = exec.collect {
        case ex: org.apache.spark.sql.execution.exchange.Exchange => ex
      }
      assert(exchanges.nonEmpty)
      exchanges.foreach { ex =>
        val cols = ex.output.map(a => s"${a.name}:${a.dataType.simpleString}")
        assert(!cols.exists(_.contains("binary")),
          s"payload bytes crossed an exchange: $cols")
      }
    }
  }

  test("q169: centroids broadcast to the batch; assignment is one narrow map") {
    val p = plan(graft.operators.Similarity.q169(spark, sfDir))
    assert(p.contains("BroadcastExchange"), p)
    // no cartesian fallback: the batch×centroid probe is the explicit
    // broadcast nested loop over the tiny centroid side only
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q172/q177: DSIR model totals broadcast as one row; the top-25 " +
    "selection never full-sorts") {
    val p = plan(graft.ops.Importance.q172(spark, sfDir))
    assert(p.contains("TakeOrderedAndProject"), p)
    assert(p.contains("BroadcastExchange"), p)
    assert(!p.contains("CartesianProduct"), p)
    val p77 = plan(graft.ops.Importance.q177(spark, sfDir))
    assert(p77.contains("BroadcastExchange"), p77)
    assert(!p77.contains("CartesianProduct"), p77)
  }

  test("q173: multiplicity join shuffles sha-256 digests only — unused " +
    "document columns die at the scan") {
    val p = plan(graft.ops.Importance.q173(spark, sfDir))
    assert(!p.contains("CartesianProduct"), p)
    // ReadSchema pruning: only (source, text) leave the parquet scan
    assert(!p.contains("n_chars"), "q173 must not read unused columns\n" + p)
    assert(!p.contains("doc_id"), "q173 must not read unused columns\n" + p)
  }

  test("q152: HLL register build is partial-aggregated (map-side combine), " +
    "no cartesian anywhere") {
    val p = plan(graft.ops.Curation.q152(spark, sfDir))
    // daily registers + merge + estimate: every groupBy must show a
    // partial_ phase so the shuffle carries <=m rows per group, not events
    assert(p.contains("partial_max"), p)
    assert(!p.contains("CartesianProduct"), p)
    // only (ts, event_type, user_id) leave the events scan
    assert(!p.contains("props"), "q152 must not read unused columns\n" + p)
  }

  test("q154: pair-register expansion broadcasts the tiny pair frame — " +
    "the corpus-sized side never re-shuffles per pair") {
    val p = plan(graft.ops.Curation.q154(spark, sfDir))
    assert(p.contains("BroadcastExchange"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q183/q184 twins: assignment/encode is a single corpus pass against " +
    "literal centroids — broadcast joins only, bounded driver state") {
    val p = plan(graft.operators.Similarity.q183(spark, sfDir))
    assert(p.contains("BroadcastExchange"), p)
    assert(!p.contains("CartesianProduct"), p)
    val p4 = plan(graft.operators.Similarity.q184(spark, sfDir))
    assert(p4.contains("BroadcastExchange"), p4)
    assert(!p4.contains("CartesianProduct"), p4)
  }

  // ── scale-shape guards for the recall/persistence/tuning twins
  //    (q186–q192) — the r12 verdict's residual nit: the broadcast
  //    threshold-join and TopKPerKey-cut shapes these queries rely on
  //    were asserted nowhere machine-checked.

  test("q186/q188 recall twins: brute leg runs the fused int_sqdist " +
    "kernel against broadcast probes — no cartesian anywhere") {
    for (q <- Seq(graft.operators.Similarity.q186 _,
        graft.operators.Similarity.q188 _)) {
      val p = plan(q(spark, sfDir))
      // the 5-probe side broadcasts; the corpus streams through once
      assert(p.contains("BroadcastExchange"), p)
      assert(!p.contains("CartesianProduct"), p)
      // exact distances come from the codegen kernel, not an interpreted
      // HOF fold
      assert(p.contains("int_sqdist"), p)
    }
  }

  test("q187/q189 persisted twins: query path scans index artifacts with " +
    "broadcast joins only — no retraining shuffle, no cartesian") {
    for (q <- Seq(graft.operators.Similarity.q187 _,
        graft.operators.Similarity.q189 _)) {
      val p = plan(q(spark, sfDir))
      assert(p.contains("BroadcastExchange"), p)
      assert(!p.contains("CartesianProduct"), p)
    }
  }

  test("q190/q192 sweep curves: the tau expansion is a broadcast join " +
    "over the bounded sweep table — never a cartesian") {
    for (q <- Seq(graft.operators.Similarity.q190 _,
        graft.operators.Similarity.q192 _)) {
      val p = plan(q(spark, sfDir))
      assert(p.contains("BroadcastExchange"), p)
      assert(!p.contains("CartesianProduct"), p)
      assert(p.contains("int_sqdist"), p)
    }
  }

  test("q191 budget sweep: the ADC candidate stream is cut by TopKPerKey " +
    "at the largest budget before ranking — no cartesian") {
    val p = plan(graft.operators.Similarity.q191(spark, sfDir))
    assert(p.contains("TopKPerKey"), p)
    assert(p.contains("BroadcastExchange"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q193 repetition signals: map-side fused kernel — no explode, no " +
    "join, nothing shuffles but the 20-row rollup") {
    val p = plan(graft.ops.Curation.q193(spark, sfDir))
    assert(p.contains("rep_covs"), p)
    assert(p.contains("partial_count"), p)
    assert(!p.contains("Generate"), p)
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("Join"), p)
    // exchanges: one hash (rollup) + one range (output order) — any third
    // means the per-row metric started shuffling window state again.
    // Counted as NODES of the pre-AQE physical plan (not regex hits on
    // the formatted string, whose line layout shifts with AQE re-planning
    // and explain-mode changes — r13 ADVICE).
    val exchanges = graft.ops.Curation.q193(spark, sfDir)
      .queryExecution.sparkPlan.collect {
        case e: org.apache.spark.sql.execution.exchange.Exchange => e
      }
    assert(exchanges.size <= 2, exchanges.mkString("\n"))
  }

  test("q54/q144 shingle digest-early: the join/distinct keys are xxhash64 " +
    "longs — no shingle string (concat_ws) or md5 hex survives in the plan") {
    // the r13 GC fix's structural pin: reintroducing string shingles (or
    // q144's md5-hex digests) into the pair core re-creates the 26-39s
    // task-GC the r12 driver record carried
    // r17: the digest staging is the fused hashed_ngrams generator (the
    // xxhash64 calls live inside the kernel), so the pin is the kernel's
    // presence plus the continued absence of string-shingle machinery
    val p54 = plan(graft.operators.Dedup.q54(spark, sfDir))
    assert(!p54.contains("concat_ws"), p54)
    assert(p54.contains("hashed_ngrams"), p54)
    val p144 = plan(graft.operators.Dedup.q144(spark, sfDir))
    assert(!p144.contains("concat_ws"), p144)
    assert(!p144.contains("md5"), p144)
    assert(p144.contains("hashed_ngrams"), p144)
  }

  test("q195 distilled-filter inference is MAP-SIDE ONLY: fused " +
    "bucket-counts kernel + literal weights — no explode, no join, no " +
    "exchange before the 20-row rollup") {
    val p = plan(graft.ops.Distill.q195(spark, sfDir))
    assert(p.contains("bucket_counts"), p)
    assert(!p.contains("Generate"), p)
    assert(!p.contains("Join"), p)
    assert(p.contains("partial_count"), p)
    // exchanges: one hash (per-source rollup) + one range (output order) —
    // a third means the margin started shuffling per-token state again
    // (the 55s/query first-cut form at 100×). Counted as plan NODES.
    val exchanges = graft.ops.Distill.q195(spark, sfDir)
      .queryExecution.sparkPlan.collect {
        case e: org.apache.spark.sql.execution.exchange.Exchange => e
      }
    OperatorCaches.release()
    assert(exchanges.size <= 2, exchanges.mkString("\n"))
  }

  test("q197 disagreement mining: top-50 compiles to TakeOrderedAndProject; " +
    "q198 sweep joins a broadcast 5-row tau table, never a cartesian") {
    val p7 = plan(graft.ops.Distill.q197(spark, sfDir))
    OperatorCaches.release()
    assert(p7.contains("TakeOrderedAndProject"), p7)
    val p8 = plan(graft.ops.Distill.q198(spark, sfDir))
    OperatorCaches.release()
    assert(p8.contains("BroadcastNestedLoopJoin") ||
      p8.contains("BroadcastExchange"), p8)
    assert(!p8.contains("CartesianProduct"), p8)
  }

  test("q29/q138: language markers run as ONE stop_counts kernel scan — " +
    "no regexp marker traversals survive in the plan (r15 port)") {
    for (q <- Seq(graft.ops.TextQueries.q29(spark, sfDir),
        graft.ops.TextQueries.q138(spark, sfDir))) {
      val p = plan(q)
      assert(p.contains("stop_counts"), p.take(2000))
      // the zh literal count legitimately stays a regexp; the four \b
      // marker alternations must not
      assert(!p.contains("der|die|und|ist"), "marker regex survived")
    }
  }

  test("q28/q151: token/subtoken/punct/stop counts are kernel scans — " +
    "no regexp_count traversal survives (r15 subtoken fold)") {
    for (q <- Seq(graft.ops.TextQueries.q28(spark, sfDir),
        graft.ops.Curation.q151(spark, sfDir))) {
      val p = plan(q)
      assert(p.contains("text_stats"), p.take(2000))
      assert(!p.toLowerCase.contains("regexp_count"), "a regex count survived")
    }
  }

  test("q202: near-dup drop-ids derive REP-LEVEL — no member-pair " +
    "expansion in the plan; the exact-dedup subtree is cached, not " +
    "recomputed 3x (r16 rewrite)") {
    // no clearCache here: the assertion is ABOUT the persist marks q202's
    // construction just registered (exact + signature groups)
    val df = graft.operators.Dedup.q202(spark, sfDir)
    val opt = df.queryExecution.optimizedPlan
    val optStr = opt.toString
    // expandInter/intraPairs mark their member explodes with _ms_ columns;
    // none may survive on the dedup path (drop-ids are rep-level)
    assert(!optStr.contains("_ms_"), "member-pair expansion survived in q202")
    val caches = opt.collect {
      case r: org.apache.spark.sql.execution.columnar.InMemoryRelation => r
    }
    OperatorCaches.release()
    // exact scans 3x (signatures, drop anti-join, closing semi-join) and
    // groups 2x — all must hit InMemoryRelation instead of recomputing
    // the quality + sha2-min_by shuffle subtree
    assert(caches.size >= 4,
      s"expected >=4 cached scans in q202's plan, got ${caches.size}")
  }

  test("q203: the tau sweep reuses ONE cached signature-group pass across " +
    "its band-join geometries; no member-pair expansion") {
    val df = graft.operators.Dedup.q203(spark, sfDir)
    val opt = df.queryExecution.optimizedPlan
    assert(!opt.toString.contains("_ms_"), "member expansion in the sweep")
    val caches = opt.collect {
      case r: org.apache.spark.sql.execution.columnar.InMemoryRelation => r
    }
    OperatorCaches.release()
    // every geometry's band join + the totals row must scan the cached
    // groups, not re-run the 64-min-agg signature pass
    assert(caches.size >= 3,
      s"expected the groups cache shared across geometries, got ${caches.size}")
  }
}
