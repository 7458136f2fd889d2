package graft.ops

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Scale patterns that exist as reusable operators rather than inline query
  * tricks: key-salting for skewed aggregation, bucketed tables for
  * co-located (shuffle-free) joins, and sketch-based distinct counting.
  * Each has an equivalence/plan test in ScaleSpec; PLANS.md discusses when
  * to reach for which.
  */
object Scale {

  /** Spread a compute-bound narrow stage over all cores when the scan
    * alone can't (shared by the Dedup and TextQueries corpus queries).
    * Two traps this escapes (both measured on q53 at sf0.1: 3.0s
    * single-core execute → 0.6s):
    *  1. a small corpus arrives as ONE scan partition, so the expensive
    *     per-row transform chain runs on one task;
    *  2. `repartition(col)` WITHOUT a count doesn't fix it — that is a
    *     coalescible shuffle origin and AQE folds the few-MB exchange
    *     back into one partition. A user-NUMBERED repartition is exempt
    *     from AQE coalescing by contract.
    * Gated on the SCAN'S PARTITION COUNT, not the file count: one 10 GB
    * parquet file already splits into ~80 partitions via
    * files.maxPartitionBytes (needs no fanout), while many tiny files can
    * coalesce into one partition (does). At 100 TB the scan has thousands
    * of partitions and this is a no-op — a small-input fixup, not a
    * standing stage. */
  def fanout(df: DataFrame, key: String): DataFrame = {
    val p = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions >= p) df else df.repartition(p, col(key))
  }

  /** Two-stage salted aggregation: count/sum-like aggregates over a
    * heavily skewed key. Stage 1 aggregates on (key, salt) — the hot key's
    * rows spread over `buckets` reducers — stage 2 merges the partials.
    * Results are identical to a direct groupBy (sums of counts/cents are
    * order-independent); only the shuffle distribution changes.
    */
  def saltedCount(df: DataFrame, keyCol: String, buckets: Int): DataFrame =
    df.withColumn("_salt", pmod(spark_partition_id() + monotonically_increasing_id(), lit(buckets)))
      .groupBy(col(keyCol), col("_salt"))
      .agg(count(lit(1)).as("_partial"))
      .groupBy(col(keyCol))
      .agg(sum(col("_partial")).as("n"))

  /** Salted sum of exact integer cents (see graft.Fns): skew-safe AND
    * bit-identical to the unsalted sum. */
  def saltedSumMoney(df: DataFrame, keyCol: String, valueCol: String,
      buckets: Int): DataFrame =
    df.withColumn("_salt", pmod(spark_partition_id() + monotonically_increasing_id(), lit(buckets)))
      .groupBy(col(keyCol), col("_salt"))
      .agg(sum(round(col(valueCol) * 100)).as("_partial_cents"))
      .groupBy(col(keyCol))
      .agg((sum(col("_partial_cents")) / 100.0).as("total"))

  /** Write a table bucketed (and sorted) by its join key. Two tables
    * bucketed the same way join with ZERO shuffle — the scan itself
    * satisfies the join's distribution requirement. This is the 100 TB
    * answer to repeated fact⋈fact joins on a stable key.
    */
  def writeBucketed(df: DataFrame, table: String, bucketCol: String,
      numBuckets: Int): Unit =
    df.write.mode(SaveMode.Overwrite)
      .bucketBy(numBuckets, bucketCol)
      .sortBy(bucketCol)
      .saveAsTable(table)

  /** Join two same-bucketed tables on the bucket key (shuffle-free —
    * asserted in ScaleSpec). */
  def bucketedJoin(spark: SparkSession, leftTable: String, rightTable: String,
      leftKey: String, rightKey: String): DataFrame =
    spark.table(leftTable)
      .join(spark.table(rightTable), col(leftKey) === col(rightKey))

  /** A10 at scale: sketch-based distinct count (HLL++). rsd=0.02 ⇒ ~2%
    * error with KiB-sized state per group instead of a distinct shuffle. */
  def approxDistinct(df: DataFrame, col_ : String, rsd: Double = 0.02): DataFrame =
    df.agg(approx_count_distinct(col(col_), rsd).as("approx_distinct"))

  // ── q80: skew-safe exact distinct-count per HOT key. A naive
  //        `groupBy(source).agg(countDistinct(token))` ships every
  //        (source, token) row to one reducer per source — 20 sources
  //        means ≥31/32 of the cluster idles while the hot keys build
  //        gigabyte hash sets. The rewrite pre-distincts on the FULL
  //        (source, token) pair — hash-partitioned over every reducer —
  //        then counts the already-unique pairs per source, which
  //        partial-aggregates map-side to one row per (source, partition).
  //        Result-identical (the oracle is the naive form), shuffle-safe
  //        at any skew.
  def q80(s: SparkSession, dir: String): DataFrame = {
    import graft.Tables.documents
    documents(s, dir)
      .select(col("source"),
        explode(expr("regexp_extract_all(lower(text), '[a-z0-9]+', 0)")).as("t"))
      .distinct()
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_distinct_tokens"))
      .orderBy(col("source"))
  }

  val q80Sql: String =
    """SELECT source, count(DISTINCT t) AS n_distinct_tokens FROM (
      |  SELECT source, unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS t
      |  FROM documents)
      |GROUP BY source ORDER BY source""".stripMargin

  // ── q94: exact-n per-source sample as ONE aggregate —
  //        org.apache.spark.sql.graft.HashReservoir, the
  //        TypedImperativeAggregate form of the TopKPerKey contract. The
  //        bounded buffer partial-aggregates map-side (≤ k entries per
  //        group per partition cross the shuffle), vs the window/sort
  //        formulation that shuffles and sorts every row. Deterministic
  //        by construction: membership = k lowest sha256(id) ranks, a
  //        pure function of the id set, replayed exactly by the DuckDB
  //        window oracle.
  def q94(s: SparkSession, dir: String): DataFrame = {
    import graft.Tables.documents
    documents(s, dir)
      .groupBy(col("source"))
      .agg(org.apache.spark.sql.graft.HashReservoir.of(col("doc_id"), 5).as("ids"))
      .select(col("source"), explode(col("ids")).as("doc_id"))
      .orderBy(col("source"), col("doc_id"))
  }

  val q94Sql: String =
    """WITH ranked AS (
      |  SELECT source, doc_id,
      |    row_number() OVER (PARTITION BY source
      |      ORDER BY sha256(CAST(doc_id AS VARCHAR)), doc_id) AS rn
      |  FROM documents)
      |SELECT source, doc_id FROM ranked WHERE rn <= 5
      |ORDER BY source, doc_id""".stripMargin

  // ── q97: deterministic train/val/test split — the assignment every
  //        training pipeline needs to be STABLE across reruns, engines,
  //        and repartitioning (a doc must never migrate between splits
  //        when data is added — that contaminates eval). Membership is a
  //        pure function of the salted content key's sha256 prefix (the
  //        q48 move, three-way): < 0xcc → train (204/256 ≈ 79.7%),
  //        < 0xe6 → val (26/256 ≈ 10.2%), else test. Narrow scan + one
  //        small groupBy; no rand(), no layout dependence.
  /** The split codomain of [[splitOf]] — every oracle spine that has to
    * enumerate splits (Pack.q108Sql's LEFT-JOIN spine) interpolates THIS
    * sequence, so renaming or adding a split breaks one constant instead
    * of silently skewing an oracle (r15 ADVICE).
    *
    * POSITION IS LOAD-BEARING (r16 ADVICE): [[splitOf]] maps the sha256
    * hash bands to `Splits(0)/(1)/(2)` positionally — index 0 = the
    * < 0xcc train band, 1 = the < 0xe6 val band, 2 = the test remainder.
    * Reordering this Seq (e.g. alphabetizing) would silently remap every
    * doc's split while all oracles keep agreeing; hence the named bands
    * below, bound by position exactly once. */
  val Splits: Seq[String] = Seq("train", "val", "test")
  private val (trainSplit, valSplit, testSplit) =
    (Splits(0), Splits(1), Splits(2))

  /** Split assignment column over a string key column (salted). */
  def splitOf(key: org.apache.spark.sql.Column,
      salt: String = "split:"): org.apache.spark.sql.Column = {
    val h = substring(sha2(concat(lit(salt), key), 256), 1, 2)
    when(h < "cc", trainSplit).when(h < "e6", valSplit).otherwise(testSplit)
  }

  def q97(s: SparkSession, dir: String): DataFrame = {
    import graft.Tables.documents
    documents(s, dir)
      .withColumn("split", splitOf(col("doc_id").cast("string")))
      .groupBy(col("split"), col("source"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("sum_chars"))
      .orderBy(col("split"), col("source"))
  }

  val q97Sql: String =
    """WITH s AS (
      |  SELECT source, n_chars,
      |    CASE WHEN substring(sha256('split:' || CAST(doc_id AS VARCHAR)), 1, 2) < 'cc' THEN 'train'
      |         WHEN substring(sha256('split:' || CAST(doc_id AS VARCHAR)), 1, 2) < 'e6' THEN 'val'
      |         ELSE 'test' END AS split
      |  FROM documents)
      |SELECT split, source, count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS sum_chars
      |FROM s GROUP BY split, source ORDER BY split, source""".stripMargin

  // ── q132: deterministic seeded corpus shuffle + sharding (training
  //         export order): the shuffle key is md5(seed:doc_id) — stable
  //         across runs and machines — the shard is the key's first hex
  //         nibble (16 shards), and within a shard the write order is the
  //         key itself. NO global sort anywhere: sharding is a map-side
  //         expression and the per-shard order is a window PARTITIONED BY
  //         shard, so at 100 TB each shard sorts independently (one
  //         exchange on shard_id, 16-way parallel writes).
  def q132(s: SparkSession, dir: String): DataFrame = {
    import graft.Tables.documents
    import org.apache.spark.sql.expressions.Window
    val keyed = documents(s, dir)
      .select(col("doc_id"), col("n_chars"),
        md5(concat_ws(":", lit("graft-shuffle-42"), col("doc_id"))).as("h"))
      .withColumn("shard_id",
        expr("CAST(instr('0123456789abcdef', substring(h, 1, 1)) - 1 AS BIGINT)"))
    val w = Window.partitionBy(col("shard_id")).orderBy(col("h"), col("doc_id"))
    keyed
      .withColumn("rn", row_number().over(w))
      .groupBy(col("shard_id"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_chars")).as("sum_chars"),
        min(col("h")).as("first_key"),
        max(col("h")).as("last_key"),
        concat_ws(",",
          max(when(col("rn") === 1, col("doc_id"))),
          max(when(col("rn") === 2, col("doc_id"))),
          max(when(col("rn") === 3, col("doc_id")))).as("head3"))
      .orderBy(col("shard_id"))
  }

  val q132Sql: String =
    """WITH k AS (
      |  SELECT doc_id, n_chars,
      |    md5('graft-shuffle-42:' || CAST(doc_id AS VARCHAR)) AS h
      |  FROM documents),
      |sh AS (
      |  SELECT doc_id, n_chars, h,
      |    CAST(strpos('0123456789abcdef', substring(h, 1, 1)) - 1 AS BIGINT) AS shard_id
      |  FROM k),
      |rn AS (
      |  SELECT *, row_number() OVER (PARTITION BY shard_id ORDER BY h, doc_id) AS rn
      |  FROM sh)
      |SELECT shard_id, count(*) AS n_docs,
      |  CAST(sum(n_chars) AS BIGINT) AS sum_chars,
      |  min(h) AS first_key, max(h) AS last_key,
      |  concat_ws(',',
      |    max(CASE WHEN rn = 1 THEN doc_id END),
      |    max(CASE WHEN rn = 2 THEN doc_id END),
      |    max(CASE WHEN rn = 3 THEN doc_id END)) AS head3
      |FROM rn GROUP BY shard_id ORDER BY shard_id""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q80_skew_distinct" -> q80,
    "q94_hash_reservoir" -> q94,
    "q97_dataset_split" -> q97,
    "q132_shuffle_shards" -> q132)

  val oracle: Map[String, String] = Map(
    "q80_skew_distinct" -> q80Sql,
    "q94_hash_reservoir" -> q94Sql,
    "q97_dataset_split" -> q97Sql,
    "q132_shuffle_shards" -> q132Sql)
}
