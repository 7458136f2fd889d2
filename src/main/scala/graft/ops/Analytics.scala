package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables._
import graft.Fns._

/** Product/OLAP analytics surface beyond plain group-bys: multi-level
  * aggregation lattices (CUBE + GROUPING), distribution bucketing
  * (ntile), bounded fuzzy matching (edit distance), wide↔long reshaping
  * (pivot's inverse), sequential-funnel and cohort-retention analysis.
  *
  * Scale notes: CUBE expands each input row into the lattice map-side and
  * partial-aggregates before the shuffle (2ᵏ× rows into the combiner, one
  * row per (group, grouping-set) out); ntile shuffles once per partition
  * key; the funnel/cohort queries reduce events to one row per user
  * (or per user-week) BEFORE any join, so joins carry user-cardinality,
  * not event-cardinality.
  */
object Analytics {

  // ── q84: CUBE over (returnflag, linestatus) with GROUPING markers —
  //        every subtotal level in one pass.
  //        The lattice runs over a PRE-AGGREGATE on the full key, not the
  //        fact table: CUBE's Expand multiplies its input ×4 before the
  //        shuffle, so feeding it every lineitem row costs 4×|fact| rows
  //        through the combiner, while count/sum are additive — aggregate
  //        to the ~6 distinct (returnflag, linestatus) rows first and the
  //        Expand touches only those (the r5 verdict's 50×-rehearsal
  //        improvement: Expand input 30M → dozens). Empty input yields 0
  //        rows either way (Spark's lattice is expand+groupBy(gid)).
  def q84(s: SparkSession, dir: String): DataFrame =
    lineitem(s, dir)
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("_n"),
        sum(cents(col("l_extendedprice"))).as("_c"))
      .cube(col("l_returnflag"), col("l_linestatus"))
      .agg(
        grouping(col("l_returnflag")).as("g_rf"),
        grouping(col("l_linestatus")).as("g_ls"),
        sum(col("_n")).as("n"),
        (sum(col("_c")) / 100.0).as("revenue"))
      .orderBy(col("g_rf"), col("g_ls"), col("l_returnflag"),
        col("l_linestatus"))

  val q84Sql: String =
    """SELECT l_returnflag, l_linestatus,
      |  grouping(l_returnflag) AS g_rf, grouping(l_linestatus) AS g_ls,
      |  count(*) AS n,
      |  sum(round(l_extendedprice * 100)) / 100.0 AS revenue
      |FROM lineitem GROUP BY CUBE(l_returnflag, l_linestatus)
      |ORDER BY g_rf, g_ls, l_returnflag, l_linestatus""".stripMargin

  // ── q101: explicit GROUPING SETS — the asymmetric aggregation lattice
  //         CUBE can't express without waste: detail by (returnflag,
  //         linestatus), a ship-year rollup, and the grand total in ONE
  //         pass (one scan + one expand, vs three scans for three
  //         groupBys).
  //         Same pre-aggregate-before-Expand shape as q84: the lattice's
  //         Expand×3 runs over the ~(6 flags × years) pre-aggregate, not
  //         the fact table.
  def q101(s: SparkSession, dir: String): DataFrame =
    lineitem(s, dir)
      .withColumn("ship_year", year(col("l_shipdate")))
      .groupBy(col("l_returnflag"), col("l_linestatus"), col("ship_year"))
      .agg(count(lit(1)).as("_n"),
        sum(cents(col("l_extendedprice"))).as("_c"))
      .groupingSets(
        Seq(Seq(col("l_returnflag"), col("l_linestatus")),
          Seq(col("ship_year")), Seq()),
        col("l_returnflag"), col("l_linestatus"), col("ship_year"))
      .agg(
        grouping(col("l_returnflag")).as("g_rf"),
        grouping(col("ship_year")).as("g_y"),
        sum(col("_n")).as("n"),
        (sum(col("_c")) / 100.0).as("revenue"))
      .orderBy(col("g_rf"), col("g_y"), col("l_returnflag"),
        col("l_linestatus"), col("ship_year"))

  val q101Sql: String =
    """SELECT l_returnflag, l_linestatus, year(l_shipdate) AS ship_year,
      |  grouping(l_returnflag) AS g_rf, grouping(year(l_shipdate)) AS g_y,
      |  count(*) AS n,
      |  sum(round(l_extendedprice * 100)) / 100.0 AS revenue
      |FROM lineitem
      |GROUP BY GROUPING SETS ((l_returnflag, l_linestatus),
      |                        (year(l_shipdate)), ())
      |ORDER BY g_rf, g_y, l_returnflag, l_linestatus, ship_year""".stripMargin

  // ── q85: decile bucketing — ntile(10) per order priority over
  //        (totalprice, orderkey) [the key breaks price ties so bucket
  //        membership is deterministic], then per-decile stats.
  def q85(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_orderpriority"))
      .orderBy(col("o_totalprice"), col("o_orderkey"))
    orders(s, dir)
      .withColumn("decile", ntile(10).over(w))
      .groupBy(col("o_orderpriority"), col("decile"))
      .agg(count(lit(1)).as("n"),
        min(col("o_totalprice")).as("lo"),
        max(col("o_totalprice")).as("hi"))
      .orderBy(col("o_orderpriority"), col("decile"))
  }

  val q85Sql: String =
    """WITH d AS (
      |  SELECT o_orderpriority, o_totalprice,
      |    ntile(10) OVER (PARTITION BY o_orderpriority
      |                    ORDER BY o_totalprice, o_orderkey) AS decile
      |  FROM orders)
      |SELECT o_orderpriority, decile, count(*) AS n,
      |  min(o_totalprice) AS lo, max(o_totalprice) AS hi
      |FROM d GROUP BY 1, 2 ORDER BY o_orderpriority, decile""".stripMargin

  // ── q86: bounded fuzzy match — nation-name pairs within edit distance 2.
  //        Integer-exact cross-engine. At scale the all-pairs form is
  //        gated the same way as q33 (bounded dims only); unbounded fuzzy
  //        joins go through length+prefix blocking first (same
  //        candidate-then-verify shape as the LSH family).
  def q86(s: SparkSession, dir: String): DataFrame = {
    val n = nation(s, dir).select(col("n_name"))
    n.select(col("n_name").as("name_a"))
      .join(broadcast(n.select(col("n_name").as("name_b"))),
        col("name_a") < col("name_b"))
      .withColumn("dist", levenshtein(col("name_a"), col("name_b")))
      .where(col("dist") <= 2)
      .orderBy(col("dist"), col("name_a"), col("name_b"))
  }

  val q86Sql: String =
    """SELECT a.n_name AS name_a, b.n_name AS name_b,
      |  levenshtein(a.n_name, b.n_name) AS dist
      |FROM nation a JOIN nation b ON a.n_name < b.n_name
      |WHERE levenshtein(a.n_name, b.n_name) <= 2
      |ORDER BY dist, name_a, name_b""".stripMargin

  // ── q87: pivot→unpivot round trip — hourly counts widened per event
  //        type, then melted back to long with the official unpivot API
  //        (zero-filled cells survive as explicit rows, which a plain
  //        GROUP BY would drop).
  def q87(s: SparkSession, dir: String): DataFrame = {
    val wide = events(s, dir)
      .groupBy(date_trunc("hour", col("ts")).as("hour_start"))
      .pivot("event_type", Seq("click", "view", "error"))
      .agg(count(lit(1)))
      .na.fill(0L)
    wide.unpivot(Array(col("hour_start")),
        Array(col("click"), col("view"), col("error")),
        "event_type", "n")
      .orderBy(col("hour_start"), col("event_type"))
  }

  val q87Sql: String =
    """WITH wide AS (
      |  SELECT date_trunc('hour', ts) AS hour_start,
      |    count(CASE WHEN event_type = 'click' THEN 1 END) AS click,
      |    count(CASE WHEN event_type = 'view' THEN 1 END) AS "view",
      |    count(CASE WHEN event_type = 'error' THEN 1 END) AS error
      |  FROM events GROUP BY 1)
      |SELECT hour_start, t.event_type,
      |  CASE t.event_type WHEN 'click' THEN click WHEN 'view' THEN "view"
      |    ELSE error END AS n
      |FROM wide CROSS JOIN (VALUES ('click'), ('view'), ('error'))
      |  t(event_type)
      |ORDER BY hour_start, event_type""".stripMargin

  // ── q88: strict sequential funnel view → click → purchase. Each stage
  //        reduces events to one row per user before the next stage's
  //        join, so every join is user-sized. Counts are BIGINT-exact.
  def q88(s: SparkSession, dir: String): DataFrame = {
    val ev = events(s, dir)
    val v = ev.where(col("event_type") === "view")
      .groupBy(col("user_id")).agg(min(col("ts")).as("v_ts"))
    val c = ev.where(col("event_type") === "click")
      .join(v, Seq("user_id"))
      .where(col("ts") >= col("v_ts"))
      .groupBy(col("user_id")).agg(min(col("ts")).as("c_ts"))
    val p = ev.where(col("event_type") === "purchase")
      .join(c, Seq("user_id"))
      .where(col("ts") >= col("c_ts"))
      .groupBy(col("user_id")).agg(min(col("ts")).as("p_ts"))
    v.agg(count(lit(1)).as("n_view"))
      .crossJoin(c.agg(count(lit(1)).as("n_click_after_view")))
      .crossJoin(p.agg(count(lit(1)).as("n_purchase_after_click")))
  }

  val q88Sql: String =
    """WITH v AS (
      |  SELECT user_id, min(ts) AS v_ts FROM events
      |  WHERE event_type = 'view' GROUP BY 1),
      |c AS (
      |  SELECT e.user_id, min(e.ts) AS c_ts
      |  FROM events e JOIN v USING (user_id)
      |  WHERE e.event_type = 'click' AND e.ts >= v.v_ts GROUP BY 1),
      |p AS (
      |  SELECT e.user_id, min(e.ts) AS p_ts
      |  FROM events e JOIN c USING (user_id)
      |  WHERE e.event_type = 'purchase' AND e.ts >= c.c_ts GROUP BY 1)
      |SELECT (SELECT count(*) FROM v) AS n_view,
      |  (SELECT count(*) FROM c) AS n_click_after_view,
      |  (SELECT count(*) FROM p) AS n_purchase_after_click""".stripMargin

  // ── q89: weekly cohort retention — users bucketed by first-seen week,
  //        counted per (cohort, week-offset). One reduction to
  //        (user, week) distinct rows, one broadcast-back of the per-user
  //        cohort, integer week arithmetic.
  def q89(s: SparkSession, dir: String): DataFrame = {
    val uw = events(s, dir)
      .select(col("user_id"),
        to_date(date_trunc("week", col("ts"))).as("wk"))
      .distinct()
    val cohort = uw.groupBy(col("user_id")).agg(min(col("wk")).as("cohort_wk"))
    uw.join(cohort, Seq("user_id"))
      .groupBy(col("cohort_wk"),
        (datediff(col("wk"), col("cohort_wk")) / 7).cast("int").as("week_offset"))
      .agg(countDistinct(col("user_id")).as("n_users"))
      .orderBy(col("cohort_wk"), col("week_offset"))
  }

  val q89Sql: String =
    """WITH uw AS (
      |  SELECT DISTINCT user_id, CAST(date_trunc('week', ts) AS DATE) AS wk
      |  FROM events),
      |cohort AS (SELECT user_id, min(wk) AS cohort_wk FROM uw GROUP BY 1)
      |SELECT cohort_wk,
      |  CAST(date_diff('day', cohort_wk, wk) / 7 AS INT) AS week_offset,
      |  count(DISTINCT user_id) AS n_users
      |FROM uw JOIN cohort USING (user_id)
      |GROUP BY 1, 2 ORDER BY cohort_wk, week_offset""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q84_cube" -> q84,
    "q85_ntile_deciles" -> q85,
    "q86_fuzzy_match" -> q86,
    "q87_unpivot" -> q87,
    "q88_funnel" -> q88,
    "q89_cohort_retention" -> q89,
    "q101_grouping_sets" -> q101)

  val oracle: Map[String, String] = Map(
    "q84_cube" -> q84Sql,
    "q85_ntile_deciles" -> q85Sql,
    "q86_fuzzy_match" -> q86Sql,
    "q87_unpivot" -> q87Sql,
    "q88_funnel" -> q88Sql,
    "q89_cohort_retention" -> q89Sql,
    "q101_grouping_sets" -> q101Sql)
}
