package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables._
import graft.Fns._

/** Join family (SURVEY.md §2.4): the reference has no joins — weather was
  * ingested but never joined (data_ingestion/ingest.py:144-152) — so these
  * generalize its single-table semantics onto the star schema, exercising
  * each physical join strategy deliberately:
  *
  *  - broadcast hash join for bounded dims (region/nation/customer/part —
  *    explicit `broadcast()` hint so the plan survives statistics drift at
  *    100 TB: the dim side stays O(MB) regardless of fact scale);
  *  - shuffle/sort-merge for fact⋈fact (orders⋈lineitem on the join key both
  *    sides shuffle-partition on — AQE converts to broadcast when the
  *    filtered side turns out small);
  *  - left-semi / left-anti for existence checks (never a full join +
  *    distinct).
  */
object Joins {

  // ── q16: broadcast hash join, dim⋈dim (nation⋈region), group on the
  //         broadcast side.
  def q16(s: SparkSession, dir: String): DataFrame =
    nation(s, dir)
      .join(broadcast(region(s, dir)),
        col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name"))
      .agg(count(lit(1)).as("n_nations"))
      .orderBy(col("r_name"))

  val q16Sql: String =
    """SELECT r_name, count(*) AS n_nations
      |FROM nation JOIN region ON n_regionkey = r_regionkey
      |GROUP BY r_name ORDER BY r_name""".stripMargin

  // ── q17: fact⋈fact join (lineitem⋈orders) — revenue per order priority.
  //         Sort-merge/shuffle-hash territory at scale; the cents trick
  //         keeps the revenue sum bit-exact across engines.
  def q17(s: SparkSession, dir: String): DataFrame =
    lineitem(s, dir)
      .join(orders(s, dir), col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderpriority"))
      .agg(
        count(lit(1)).as("n_items"),
        (sum(cents(col("l_extendedprice") * (lit(1) - col("l_discount")))) / 100.0)
          .as("revenue"))
      .orderBy(col("o_orderpriority"))

  val q17Sql: String =
    """SELECT o_orderpriority, count(*) AS n_items,
      |  sum(round(l_extendedprice * (1 - l_discount) * 100)) / 100.0 AS revenue
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin

  // ── q18: left-semi join (EXISTS) — customers that have orders, counted
  //         per market segment. Semi join never widens rows: shuffle carries
  //         only the key column of the right side.
  def q18(s: SparkSession, dir: String): DataFrame =
    customer(s, dir)
      .join(orders(s, dir).select(col("o_custkey")),
        col("c_custkey") === col("o_custkey"), "left_semi")
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_customers"))
      .orderBy(col("c_mktsegment"))

  val q18Sql: String =
    """SELECT c_mktsegment, count(*) AS n_customers
      |FROM customer
      |WHERE c_custkey IN (SELECT o_custkey FROM orders)
      |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin

  // ── q19: left-anti join (NOT EXISTS) — customers with no recent orders.
  //         NOT EXISTS (not NOT IN) in the oracle: anti-join null semantics
  //         match NOT EXISTS, not NOT IN (SURVEY.md §7.5).
  def q19(s: SparkSession, dir: String): DataFrame =
    customer(s, dir)
      .join(
        orders(s, dir)
          .filter(col("o_orderdate") >= to_timestamp(lit("2001-01-01 00:00:00")))
          .select(col("o_custkey")),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_customers"))
      .orderBy(col("c_mktsegment"))

  val q19Sql: String =
    """SELECT c_mktsegment, count(*) AS n_customers
      |FROM customer
      |WHERE NOT EXISTS (SELECT 1 FROM orders
      |  WHERE o_custkey = c_custkey
      |    AND o_orderdate >= TIMESTAMP '2001-01-01 00:00:00')
      |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin

  // ── q20: star join (lineitem⋈orders⋈customer⋈nation⋈region) — revenue by
  //         region, TPC-H Q5 shape. Dims broadcast; only the
  //         lineitem⋈orders edge shuffles. At 1000 executors this is one
  //         shuffle stage + three map-side broadcast probes.
  def q20(s: SparkSession, dir: String): DataFrame =
    lineitem(s, dir)
      .join(orders(s, dir), col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(customer(s, dir)), col("o_custkey") === col("c_custkey"))
      .join(broadcast(nation(s, dir)), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(region(s, dir)), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name"))
      .agg(
        count(lit(1)).as("n_items"),
        (sum(cents(col("l_extendedprice") * (lit(1) - col("l_discount")))) / 100.0)
          .as("revenue"))
      .orderBy(col("r_name"))

  val q20Sql: String =
    """SELECT r_name, count(*) AS n_items,
      |  sum(round(l_extendedprice * (1 - l_discount) * 100)) / 100.0 AS revenue
      |FROM lineitem
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |JOIN nation ON c_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |GROUP BY r_name ORDER BY r_name""".stripMargin

  // ── q157: FULL-OUTER reconciliation — the two-system audit join (which
  //         keys exist only in the warehouse, only in the event log, or in
  //         both, and do the volumes agree): per-key order counts
  //         full-outer-joined to per-key event counts, null-safe status
  //         classification. Both sides aggregate BEFORE the join (the
  //         outer join runs on two already-small keyed aggregates, never
  //         on raw fact×fact), so at 100 TB this is two partial-agg
  //         exchanges plus one merge join on key counts.
  def q157(s: SparkSession, dir: String): DataFrame = {
    val o = orders(s, dir).groupBy(col("o_custkey").as("k"))
      .agg(count(lit(1)).as("n_orders"))
    val e = events(s, dir).groupBy(col("user_id").as("k"))
      .agg(count(lit(1)).as("n_events"))
    o.join(e, Seq("k"), "full_outer")
      .select(col("k"),
        coalesce(col("n_orders"), lit(0L)).as("n_orders"),
        coalesce(col("n_events"), lit(0L)).as("n_events"),
        when(col("n_orders").isNull, "events_only")
          .when(col("n_events").isNull, "orders_only")
          .otherwise("both").as("status"))
      .orderBy(col("k"))
  }

  val q157Sql: String =
    """WITH o AS (SELECT o_custkey AS k, count(*) AS n_orders
      |           FROM orders GROUP BY 1),
      |e AS (SELECT user_id AS k, count(*) AS n_events
      |      FROM events GROUP BY 1)
      |SELECT coalesce(o.k, e.k) AS k,
      |  coalesce(n_orders, 0) AS n_orders,
      |  coalesce(n_events, 0) AS n_events,
      |  CASE WHEN o.k IS NULL THEN 'events_only'
      |       WHEN e.k IS NULL THEN 'orders_only'
      |       ELSE 'both' END AS status
      |FROM o FULL OUTER JOIN e ON o.k = e.k
      |ORDER BY k""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q16_join_broadcast" -> q16,
    "q17_join_fact" -> q17,
    "q18_join_semi" -> q18,
    "q19_join_anti" -> q19,
    "q20_join_star" -> q20,
    "q157_outer_reconcile" -> q157)

  val oracle: Map[String, String] = Map(
    "q16_join_broadcast" -> q16Sql,
    "q17_join_fact" -> q17Sql,
    "q18_join_semi" -> q18Sql,
    "q19_join_anti" -> q19Sql,
    "q20_join_star" -> q20Sql,
    "q157_outer_reconcile" -> q157Sql)
}
