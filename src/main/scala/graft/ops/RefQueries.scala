package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables._
import graft.Fns._

/** Reference-parity query family, re-phrased on the TPC-H-ish fixtures
  * (mapping table in FIXTURES.md §B): flights→orders/lineitem,
  * carrier→o_orderpriority, route→(returnflag,linestatus)/(suppkey,partkey),
  * flight_date→o_orderdate/l_shipdate, delay predicate→price/discount
  * thresholds.
  *
  * Covers SURVEY.md §2 operators: A1–A11 (aggregations), O1–O8 (sort/limit/
  * top-k/sample), F1–F5 (filters incl. keyset cursor), P1–P4 (projections),
  * U1 (union-distinct), X1–X16 (scalar functions).
  *
  * Scale notes (100 TB tier): every aggregate here is a single hash
  * aggregate (partial+final, map-side combine); top-k queries compile to
  * TakeOrderedAndProject (no full sort); all filters/projections push into
  * the parquet scan. No collect(), no driver-side loops.
  */
object RefQueries {

  // ── q01: pricing summary (A5/A7 partial+final multi-agg, X11 round,
  //         O5 sort) — reference performance_metrics shape
  //         (dags/flight_data_pipeline.py:136-158) on lineitem, TPC-H-Q1
  //         style. Flagship `entry` query.
  def q01(s: SparkSession, dir: String): DataFrame =
    lineitem(s, dir)
      .filter(col("l_shipdate") <= to_timestamp(lit("2001-09-02 00:00:00")))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(col("l_quantity")).as("sum_qty"),
        (sum(cents(col("l_extendedprice"))) / 100.0).as("sum_base_price"),
        (sum(cents(col("l_extendedprice") * (lit(1) - col("l_discount")))) / 100.0)
          .as("sum_disc_price"),
        (sum(cents(col("l_extendedprice") * (lit(1) - col("l_discount")) * (lit(1) + col("l_tax")))) / 100.0)
          .as("sum_charge"),
        (sum(col("l_quantity")) / count(lit(1))).as("avg_qty"),
        (sum(cents(col("l_extendedprice"))) / count(lit(1)) / 100.0).as("avg_price"),
        (sum(cents(col("l_discount"))) / count(lit(1)) / 100.0).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))

  val q01Sql: String =
    """SELECT l_returnflag, l_linestatus,
      |  sum(l_quantity) AS sum_qty,
      |  sum(round(l_extendedprice * 100)) / 100.0 AS sum_base_price,
      |  sum(round(l_extendedprice * (1 - l_discount) * 100)) / 100.0 AS sum_disc_price,
      |  sum(round(l_extendedprice * (1 - l_discount) * (1 + l_tax) * 100)) / 100.0 AS sum_charge,
      |  sum(l_quantity) / count(*) AS avg_qty,
      |  sum(round(l_extendedprice * 100)) / count(*) / 100.0 AS avg_price,
      |  sum(round(l_discount * 100)) / count(*) / 100.0 AS avg_disc,
      |  count(*) AS count_order
      |FROM lineitem
      |WHERE l_shipdate <= TIMESTAMP '2001-09-02 00:00:00'
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin

  // ── q02: per-carrier performance metrics (A7 multi-agg + F5 conditional
  //         count + A9 ratio-of-aggregates + X11 + O5 desc sort) —
  //         dags/flight_data_pipeline.py:136-158 transliterated onto orders;
  //         "airline" → o_orderpriority, "delayed" → status 'F'.
  def q02(s: SparkSession, dir: String): DataFrame =
    orders(s, dir)
      .groupBy(col("o_orderpriority"))
      .agg(
        count(lit(1)).as("total_flights"),
        (sum(cents(col("o_totalprice"))) / count(lit(1)) / 100.0).as("avg_price"),
        count(when(col("o_orderstatus") === "F", 1)).as("delayed_flights"),
        count(when(col("o_orderstatus") === "O", 1)).as("ontime_flights"))
      .withColumn("ontime_percentage",
        round(col("ontime_flights") / col("total_flights") * 100 * 100) / 100.0)
      .orderBy(desc("total_flights"), col("o_orderpriority"))

  val q02Sql: String =
    """WITH g AS (
      |  SELECT o_orderpriority,
      |    count(*) AS total_flights,
      |    sum(round(o_totalprice * 100)) / count(*) / 100.0 AS avg_price,
      |    count(CASE WHEN o_orderstatus = 'F' THEN 1 END) AS delayed_flights,
      |    count(CASE WHEN o_orderstatus = 'O' THEN 1 END) AS ontime_flights
      |  FROM orders GROUP BY o_orderpriority)
      |SELECT o_orderpriority, total_flights, avg_price, delayed_flights,
      |  ontime_flights,
      |  round(ontime_flights / total_flights * 100 * 100) / 100.0 AS ontime_percentage
      |FROM g ORDER BY total_flights DESC, o_orderpriority""".stripMargin

  // ── q03: route analysis (A6 two-key group + A3 avg + F5 + A9 + X16 route
  //         key + O5) — dags/flight_data_pipeline.py:185-203; route →
  //         (l_returnflag, l_linestatus), delay → discount > 0.05.
  def q03(s: SparkSession, dir: String): DataFrame =
    lineitem(s, dir)
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        count(lit(1)).as("total_flights"),
        (sum(cents(col("l_discount"))) / count(lit(1)) / 100.0).as("avg_discount"),
        count(when(col("l_discount") > 0.05, 1)).as("delayed_flights"))
      .select(
        concat_ws("-", col("l_returnflag"), col("l_linestatus")).as("route"),
        col("total_flights"), col("avg_discount"), col("delayed_flights"),
        (round((col("total_flights") - col("delayed_flights")) / col("total_flights") * 100 * 100) / 100.0)
          .as("ontime_percentage"))
      .orderBy(desc("total_flights"), col("route"))

  val q03Sql: String =
    """WITH g AS (
      |  SELECT l_returnflag, l_linestatus,
      |    count(*) AS total_flights,
      |    sum(round(l_discount * 100)) / count(*) / 100.0 AS avg_discount,
      |    count(CASE WHEN l_discount > 0.05 THEN 1 END) AS delayed_flights
      |  FROM lineitem GROUP BY l_returnflag, l_linestatus)
      |SELECT concat_ws('-', l_returnflag, l_linestatus) AS route,
      |  total_flights, avg_discount, delayed_flights,
      |  round((total_flights - delayed_flights) / total_flights * 100 * 100) / 100.0 AS ontime_percentage
      |FROM g ORDER BY total_flights DESC, route""".stripMargin

  // ── q04: top-10 routes by traffic (A6 high-cardinality two-key group +
  //         O3 top-k) — api/app.py:246-248. Plans as hash-agg →
  //         TakeOrderedAndProject: no full sort at any scale.
  def q04(s: SparkSession, dir: String): DataFrame =
    lineitem(s, dir)
      .groupBy(col("l_suppkey"), col("l_partkey"))
      .agg(count(lit(1)).as("flight_count"))
      .orderBy(desc("flight_count"), col("l_suppkey"), col("l_partkey"))
      .limit(10)

  val q04Sql: String =
    """SELECT l_suppkey, l_partkey, count(*) AS flight_count
      |FROM lineitem GROUP BY l_suppkey, l_partkey
      |ORDER BY flight_count DESC, l_suppkey, l_partkey LIMIT 10""".stripMargin

  // ── q05: worst-5 routes by on-time pct (O4 nsmallest) —
  //         dags/flight_data_pipeline.py:218. Same grouping as q03.
  def q05(s: SparkSession, dir: String): DataFrame =
    lineitem(s, dir)
      .groupBy(col("l_suppkey"))
      .agg(
        count(lit(1)).as("total_flights"),
        count(when(col("l_discount") > 0.05, 1)).as("delayed_flights"))
      .select(
        col("l_suppkey"), col("total_flights"), col("delayed_flights"),
        (round((col("total_flights") - col("delayed_flights")) / col("total_flights") * 100 * 100) / 100.0)
          .as("ontime_percentage"))
      .orderBy(col("ontime_percentage"), col("l_suppkey"))
      .limit(5)

  val q05Sql: String =
    """WITH g AS (
      |  SELECT l_suppkey, count(*) AS total_flights,
      |    count(CASE WHEN l_discount > 0.05 THEN 1 END) AS delayed_flights
      |  FROM lineitem GROUP BY l_suppkey)
      |SELECT l_suppkey, total_flights, delayed_flights,
      |  round((total_flights - delayed_flights) / total_flights * 100 * 100) / 100.0 AS ontime_percentage
      |FROM g ORDER BY ontime_percentage, l_suppkey LIMIT 5""".stripMargin

  // ── q06: top-5 carriers by frequency (A8 value_counts + O3) —
  //         data_processing/process.py:135, api/app.py:268; carrier →
  //         p_brand.
  def q06(s: SparkSession, dir: String): DataFrame =
    part(s, dir)
      .groupBy(col("p_brand"))
      .agg(count(lit(1)).as("n"))
      .orderBy(desc("n"), col("p_brand"))
      .limit(5)

  val q06Sql: String =
    """SELECT p_brand, count(*) AS n FROM part GROUP BY p_brand
      |ORDER BY n DESC, p_brand LIMIT 5""".stripMargin

  // ── q07: distinct airports (U1 union + A10 distinct + sort) —
  //         api/app.py:322-324; origins∪destinations → suppkeys∪partkeys.
  def q07(s: SparkSession, dir: String): DataFrame = {
    val li = lineitem(s, dir)
    li.select(col("l_suppkey").as("airport"))
      .union(li.select(col("l_partkey").as("airport")))
      .distinct()
      .orderBy(col("airport"))
  }

  val q07Sql: String =
    """SELECT DISTINCT airport FROM (
      |  SELECT l_suppkey AS airport FROM lineitem
      |  UNION ALL SELECT l_partkey AS airport FROM lineitem)
      |ORDER BY airport""".stripMargin

  // ── q08: paged flight scan with keyset cursor (F1 range + F2 equality +
  //         F3 composite seek + O1 multi-key sort + O2 limit, P1 project) —
  //         api/app.py:60-181. Cursor = (o_orderdate, o_orderkey) natural
  //         key (SURVEY.md §7.5: never monotonically_increasing_id in
  //         oracle-compared queries). Plans as TakeOrderedAndProject.
  def q08(s: SparkSession, dir: String): DataFrame =
    orders(s, dir)
      .filter(col("o_orderdate") >= to_timestamp(lit("1996-01-01 00:00:00")))
      .filter(col("o_orderdate") <= to_timestamp(lit("1998-12-31 00:00:00")))
      .filter(col("o_orderstatus") === "O")
      .filter(col("o_orderdate") > to_timestamp(lit("1997-06-01 00:00:00")) ||
        (col("o_orderdate") === to_timestamp(lit("1997-06-01 00:00:00")) &&
          col("o_orderkey") > 9000))
      .select(col("o_orderkey"), col("o_orderdate"), col("o_orderpriority"),
        col("o_totalprice"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
      .limit(100)

  val q08Sql: String =
    """SELECT o_orderkey, o_orderdate, o_orderpriority, o_totalprice
      |FROM orders
      |WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      |  AND o_orderdate <= TIMESTAMP '1998-12-31 00:00:00'
      |  AND o_orderstatus = 'O'
      |  AND (o_orderdate > TIMESTAMP '1997-06-01 00:00:00'
      |       OR (o_orderdate = TIMESTAMP '1997-06-01 00:00:00' AND o_orderkey > 9000))
      |ORDER BY o_orderdate, o_orderkey LIMIT 100""".stripMargin

  // ── q09: page total count (O8) — api/app.py:177: count of the filtered
  //         set, recomputed independently of the page.
  def q09(s: SparkSession, dir: String): DataFrame =
    orders(s, dir)
      .filter(col("o_orderdate") >= to_timestamp(lit("1996-01-01 00:00:00")))
      .filter(col("o_orderdate") <= to_timestamp(lit("1998-12-31 00:00:00")))
      .filter(col("o_orderstatus") === "O")
      .agg(count(lit(1)).as("total_count"))

  val q09Sql: String =
    """SELECT count(*) AS total_count FROM orders
      |WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      |  AND o_orderdate <= TIMESTAMP '1998-12-31 00:00:00'
      |  AND o_orderstatus = 'O'""".stripMargin

  // ── q10: metrics summary (api/app.py:183-289): one wide shuffle-free
  //         partial+final agg — A1 count, A2 mean→rate, A3 avg, A4 min/max.
  def q10(s: SparkSession, dir: String): DataFrame =
    orders(s, dir)
      .filter(col("o_orderdate") >= to_timestamp(lit("1995-06-01 00:00:00")))
      .agg(
        count(lit(1)).as("total_flights"),
        // nullif guard: an empty slice (0 rows after the date filter) must
        // summarize as null rates, not throw DIVIDE_BY_ZERO under ANSI
        (round(count(when(col("o_orderstatus") === "P", 1)) / nullif(count(lit(1)), lit(0)) * 100 * 100) / 100.0)
          .as("cancellation_rate"),
        (round(count(when(col("o_totalprice") > 300000, 1)) / nullif(count(lit(1)), lit(0)) * 100 * 100) / 100.0)
          .as("delay_rate"),
        (sum(cents(col("o_totalprice"))) / count(lit(1)) / 100.0).as("avg_price"),
        max(col("o_totalprice")).as("max_price"),
        min(col("o_totalprice")).as("min_price"),
        min(col("o_orderdate")).as("first_date"),
        max(col("o_orderdate")).as("last_date"))

  val q10Sql: String =
    """SELECT count(*) AS total_flights,
      |  round(count(CASE WHEN o_orderstatus = 'P' THEN 1 END) / nullif(count(*), 0) * 100 * 100) / 100.0 AS cancellation_rate,
      |  round(count(CASE WHEN o_totalprice > 300000 THEN 1 END) / nullif(count(*), 0) * 100 * 100) / 100.0 AS delay_rate,
      |  sum(round(o_totalprice * 100)) / count(*) / 100.0 AS avg_price,
      |  max(o_totalprice) AS max_price,
      |  min(o_totalprice) AS min_price,
      |  min(o_orderdate) AS first_date,
      |  max(o_orderdate) AS last_date
      |FROM orders
      |WHERE o_orderdate >= TIMESTAMP '1995-06-01 00:00:00'""".stripMargin

  // ── q11: ingestion projection + scalar-function library (P1 project/
  //         rename, X1 clean_time HHMM→"HH:MM", X2 upper, X4 date_format,
  //         X5 cast, X6 naive HHMM delay arithmetic — intentionally
  //         replicated, SURVEY.md §7.5 —, X13 zfill/lpad, X16 route key) —
  //         data_ingestion/ingest.py:314-333, data_processing/process.py:37-67.
  //         Pure narrow projection: no shuffle, full pushdown.
  def q11(s: SparkSession, dir: String): DataFrame = {
    val dep = lpad((col("o_orderkey") % 2400).cast("string"), 4, "0")
    val arr = lpad((col("o_custkey") % 2400).cast("string"), 4, "0")
    orders(s, dir)
      .select(
        col("o_orderkey").as("flight_number"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("flight_date"),
        upper(col("o_orderpriority")).as("airline"),
        dep.as("sched_dep_raw"),
        concat(substring(dep, 1, 2), lit(":"), substring(dep, 3, 2)).as("scheduled_departure"),
        concat(substring(arr, 1, 2), lit(":"), substring(arr, 3, 2)).as("scheduled_arrival"),
        ((col("o_orderkey") % 2400).cast("double") - (col("o_custkey") % 2400).cast("double"))
          .as("departure_delay"),
        concat_ws("-", (col("o_custkey") % 100).cast("string"),
          (col("o_orderkey") % 100).cast("string")).as("route_key"))
      .orderBy(col("flight_number"))
  }

  val q11Sql: String =
    """SELECT o_orderkey AS flight_number,
      |  strftime(o_orderdate, '%Y-%m-%d') AS flight_date,
      |  upper(o_orderpriority) AS airline,
      |  lpad(CAST(o_orderkey % 2400 AS VARCHAR), 4, '0') AS sched_dep_raw,
      |  concat(substring(lpad(CAST(o_orderkey % 2400 AS VARCHAR), 4, '0'), 1, 2), ':',
      |         substring(lpad(CAST(o_orderkey % 2400 AS VARCHAR), 4, '0'), 3, 2)) AS scheduled_departure,
      |  concat(substring(lpad(CAST(o_custkey % 2400 AS VARCHAR), 4, '0'), 1, 2), ':',
      |         substring(lpad(CAST(o_custkey % 2400 AS VARCHAR), 4, '0'), 3, 2)) AS scheduled_arrival,
      |  CAST(o_orderkey % 2400 AS DOUBLE) - CAST(o_custkey % 2400 AS DOUBLE) AS departure_delay,
      |  concat_ws('-', CAST(o_custkey % 100 AS VARCHAR), CAST(o_orderkey % 100 AS VARCHAR)) AS route_key
      |FROM orders ORDER BY flight_number""".stripMargin

  // ── q12: status derivation (X7 comparison→bool, X9 conditional assign,
  //         X15 threshold label, F4 null-test) —
  //         data_processing/process.py:163-168, dags/…:244.
  def q12(s: SparkSession, dir: String): DataFrame =
    orders(s, dir)
      .select(
        col("o_orderkey"),
        col("o_totalprice"),
        (col("o_totalprice") > 300000).as("is_delayed"),
        when(col("o_totalprice") > 300000, "Delayed").otherwise("On Time")
          .as("flight_status"),
        when(col("o_totalprice") > 400000, "Good").otherwise("Needs Improvement")
          .as("quality_label"),
        col("o_custkey").isNull.as("missing_customer"))
      .orderBy(col("o_orderkey"))

  val q12Sql: String =
    """SELECT o_orderkey, o_totalprice,
      |  o_totalprice > 300000 AS is_delayed,
      |  CASE WHEN o_totalprice > 300000 THEN 'Delayed' ELSE 'On Time' END AS flight_status,
      |  CASE WHEN o_totalprice > 400000 THEN 'Good' ELSE 'Needs Improvement' END AS quality_label,
      |  o_custkey IS NULL AS missing_customer
      |FROM orders ORDER BY o_orderkey""".stripMargin

  // ── q13: per-column missing-% profile (A11, feeds the P2 >70%-missing
  //         column drop, data_processing/process.py:23-34): single-pass
  //         shuffle-free agg, one avg per column.
  def q13(s: SparkSession, dir: String): DataFrame = {
    val cols = Seq("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
      "o_orderdate", "o_orderpriority")
    orders(s, dir).agg(
      (avg(col(cols.head).isNull.cast("int")) * 100).as(s"missing_pct_${cols.head}"),
      cols.tail.map(c => (avg(col(c).isNull.cast("int")) * 100).as(s"missing_pct_$c")): _*)
  }

  val q13Sql: String =
    """SELECT
      |  avg(CAST(o_orderkey IS NULL AS INT)) * 100 AS missing_pct_o_orderkey,
      |  avg(CAST(o_custkey IS NULL AS INT)) * 100 AS missing_pct_o_custkey,
      |  avg(CAST(o_orderstatus IS NULL AS INT)) * 100 AS missing_pct_o_orderstatus,
      |  avg(CAST(o_totalprice IS NULL AS INT)) * 100 AS missing_pct_o_totalprice,
      |  avg(CAST(o_orderdate IS NULL AS INT)) * 100 AS missing_pct_o_orderdate,
      |  avg(CAST(o_orderpriority IS NULL AS INT)) * 100 AS missing_pct_o_orderpriority
      |FROM orders""".stripMargin

  // ── q14: value-range validation (V4 range 0..1 check + A4 min/max +
  //         X10 fillna semantics via coalesce) —
  //         data_processing/process.py:110-117.
  def q14(s: SparkSession, dir: String): DataFrame =
    lineitem(s, dir).agg(
      min(col("l_discount")).as("min_discount"),
      max(col("l_discount")).as("max_discount"),
      min(col("l_tax")).as("min_tax"),
      max(col("l_tax")).as("max_tax"),
      count(when(col("l_discount") < 0 || col("l_discount") > 1, 1))
        .as("discount_range_violations"),
      count(when(coalesce(col("l_quantity"), lit(0.0)) === 0.0, 1))
        .as("zero_or_null_quantity"))

  val q14Sql: String =
    """SELECT min(l_discount) AS min_discount, max(l_discount) AS max_discount,
      |  min(l_tax) AS min_tax, max(l_tax) AS max_tax,
      |  count(CASE WHEN l_discount < 0 OR l_discount > 1 THEN 1 END) AS discount_range_violations,
      |  count(CASE WHEN coalesce(l_quantity, 0.0) = 0.0 THEN 1 END) AS zero_or_null_quantity
      |FROM lineitem""".stripMargin

  // ── q15: seeded deterministic sample (O7) — sampling.py:17-24
  //         (`df.sample(n=2000, random_state=42)` then sort by date).
  //         Round 9: the rank key is now xxhash64(o_orderkey) instead of
  //         rand(42) — rand's per-partition seeding made the sample
  //         depend on the input PARTITIONING (a real 100 TB defect: a
  //         repartitioned rerun silently draws a different sample),
  //         while a key hash is a pure function of the row. Same seeded
  //         exact-n semantics, now partition-invariant AND oracle-exact
  //         (Xxh64Sql.longHashCtes replays the hash). At 100 TB: the
  //         sort-by-hash take-n is a TakeOrderedAndProject — a
  //         distributed tournament top-k, not a full sort.
  def q15(s: SparkSession, dir: String): DataFrame =
    orders(s, dir)
      .withColumn("_r", xxhash64(col("o_orderkey")))
      .orderBy(col("_r"), col("o_orderkey"))
      .limit(200)
      .drop("_r")
      .orderBy(col("o_orderdate"), col("o_orderkey"))

  val q15Sql: String =
    s"""WITH ${graft.sql.Xxh64Sql.longHashCtes(
        "SELECT o_orderkey AS k FROM orders")},
      |picked AS (
      |  SELECT o.* FROM orders o JOIN xlh ON o.o_orderkey = xlh.k
      |  ORDER BY xlh.hs, o.o_orderkey LIMIT 200)
      |SELECT * FROM picked ORDER BY o_orderdate, o_orderkey""".stripMargin

  // ── q46: pivot — status-count matrix per carrier (groupBy.pivot; the
  //        warehouse form of the reference's value_counts tables). Pinned
  //        pivot values keep the schema static — at scale an un-pinned
  //        pivot needs a distinct-scan first.
  def q46(s: SparkSession, dir: String): DataFrame =
    orders(s, dir)
      .groupBy(col("o_orderpriority"))
      .pivot("o_orderstatus", Seq("F", "O", "P"))
      .agg(count(lit(1)))
      .na.fill(0L)
      .orderBy(col("o_orderpriority"))

  val q46Sql: String =
    """SELECT o_orderpriority,
      |  count(CASE WHEN o_orderstatus = 'F' THEN 1 END) AS "F",
      |  count(CASE WHEN o_orderstatus = 'O' THEN 1 END) AS "O",
      |  count(CASE WHEN o_orderstatus = 'P' THEN 1 END) AS "P"
      |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin

  // ── q47: rollup — hierarchical subtotals over (returnflag, linestatus)
  //        with grand total; null grouping keys surfaced as 'ALL'.
  def q47(s: SparkSession, dir: String): DataFrame =
    lineitem(s, dir)
      .rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("n"), sum(col("l_quantity")).as("sum_qty"))
      .select(
        coalesce(col("l_returnflag"), lit("ALL")).as("rf"),
        coalesce(col("l_linestatus"), lit("ALL")).as("ls"),
        col("n"), col("sum_qty"))
      .orderBy(col("rf"), col("ls"))

  val q47Sql: String =
    """SELECT coalesce(l_returnflag, 'ALL') AS rf,
      |  coalesce(l_linestatus, 'ALL') AS ls,
      |  count(*) AS n, sum(l_quantity) AS sum_qty
      |FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
      |ORDER BY rf, ls""".stripMargin

  // ── q48: content-hash sampling — the O7 sampler done right for scale:
  //        membership depends only on the key's SHA-256 prefix, so the
  //        sample is reproducible across engines, partitionings, and
  //        re-runs (rand(seed)-based sampling is stable only for a fixed
  //        input layout). ~1/64 rate via a 2-hex-digit prefix threshold.
  def q48(s: SparkSession, dir: String): DataFrame =
    orders(s, dir)
      .filter(substring(sha2(col("o_orderkey").cast("string"), 256), 1, 2) < "04")
      .select(col("o_orderkey"), col("o_orderdate"), col("o_totalprice"))
      .orderBy(col("o_orderkey"))

  val q48Sql: String =
    """SELECT o_orderkey, o_orderdate, o_totalprice FROM orders
      |WHERE substring(sha256(CAST(o_orderkey AS VARCHAR)), 1, 2) < '04'
      |ORDER BY o_orderkey""".stripMargin

  // ── q52: seeded EXACT-n sample, content-hash ranked — q15's semantics
  //        (exact n, seeded, deterministic) made engine-portable: rank
  //        every key by sha256("s42:" || key) and take the n smallest.
  //        The "seed" is the salt prefix; any seed change reshuffles the
  //        ranking. Unlike rand(seed) this survives repartitioning, and
  //        unlike q48's rate-sample it returns exactly n rows. The limit
  //        compiles to TakeOrderedAndProject (distributed tournament
  //        top-k) — no global sort at scale.
  def q52(s: SparkSession, dir: String): DataFrame =
    orders(s, dir)
      .select(col("o_orderkey"), col("o_orderdate"), col("o_totalprice"),
        sha2(concat(lit("s42:"), col("o_orderkey").cast("string")), 256).as("_h"))
      .orderBy(col("_h"))
      .limit(200)
      .drop("_h")
      .orderBy(col("o_orderkey"))

  val q52Sql: String =
    """SELECT o_orderkey, o_orderdate, o_totalprice FROM (
      |  SELECT o_orderkey, o_orderdate, o_totalprice
      |  FROM orders
      |  ORDER BY sha256('s42:' || CAST(o_orderkey AS VARCHAR)) LIMIT 200)
      |ORDER BY o_orderkey""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q46_pivot" -> q46,
    "q47_rollup" -> q47,
    "q48_hash_sample" -> q48,
    "q01_pricing_summary" -> q01,
    "q02_carrier_metrics" -> q02,
    "q03_route_analysis" -> q03,
    "q04_top_routes" -> q04,
    "q05_worst_routes" -> q05,
    "q06_top_carriers" -> q06,
    "q07_airports_distinct" -> q07,
    "q08_flights_page" -> q08,
    "q09_page_count" -> q09,
    "q10_metrics_summary" -> q10,
    "q11_clean_project" -> q11,
    "q12_flight_status" -> q12,
    "q13_null_profile" -> q13,
    "q14_value_ranges" -> q14,
    "q15_seeded_sample" -> q15,
    "q52_seeded_hash_sample" -> q52)

  val oracle: Map[String, String] = Map(
    "q15_seeded_sample" -> q15Sql,
    "q46_pivot" -> q46Sql,
    "q47_rollup" -> q47Sql,
    "q48_hash_sample" -> q48Sql,
    "q52_seeded_hash_sample" -> q52Sql,
    "q01_pricing_summary" -> q01Sql,
    "q02_carrier_metrics" -> q02Sql,
    "q03_route_analysis" -> q03Sql,
    "q04_top_routes" -> q04Sql,
    "q05_worst_routes" -> q05Sql,
    "q06_top_carriers" -> q06Sql,
    "q07_airports_distinct" -> q07Sql,
    "q08_flights_page" -> q08Sql,
    "q09_page_count" -> q09Sql,
    "q10_metrics_summary" -> q10Sql,
    "q11_clean_project" -> q11Sql,
    "q12_flight_status" -> q12Sql,
    "q13_null_profile" -> q13Sql,
    "q14_value_ranges" -> q14Sql)
}
