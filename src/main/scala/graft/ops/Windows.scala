package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables._
import graft.Fns._

/** Window-function family. The reference has no window functions
  * (SURVEY.md §2.10) — these carry its pagination/top-k semantics into the
  * shapes a warehouse user expects: per-group top-n, running totals, and
  * gap-based sessionization (the reference's daily-batch notion of time,
  * generalized). All window keys include a unique tiebreaker so results are
  * deterministic (§7.5).
  */
object Windows {

  // ── q21: per-group top-n via row_number (the distributed form of the
  //         reference's nlargest-per-key, O3). row_number cast to BIGINT to
  //         match DuckDB's window type.
  def q21(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_orderpriority"))
      .orderBy(desc("o_totalprice"), col("o_orderkey"))
    orders(s, dir)
      .withColumn("rn", row_number().over(w).cast("long"))
      .filter(col("rn") <= 3)
      .select(col("o_orderpriority"), col("rn"), col("o_orderkey"),
        col("o_totalprice"))
      .orderBy(col("o_orderpriority"), col("rn"))
  }

  val q21Sql: String =
    """SELECT o_orderpriority, rn, o_orderkey, o_totalprice FROM (
      |  SELECT o_orderpriority, o_orderkey, o_totalprice,
      |    row_number() OVER (PARTITION BY o_orderpriority
      |                       ORDER BY o_totalprice DESC, o_orderkey) AS rn
      |  FROM orders) t
      |WHERE rn <= 3 ORDER BY o_orderpriority, rn""".stripMargin

  // ── q22: running total per customer (cumulative spend over order date).
  //         Sum runs over exact integer cents → order-independent,
  //         bit-identical across engines.
  def q22(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    orders(s, dir)
      .filter(col("o_custkey") < 100)
      .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"),
        (sum(cents(col("o_totalprice"))).over(w) / 100.0).as("running_spend"))
      .orderBy(col("o_custkey"), col("o_orderdate"), col("o_orderkey"))
  }

  val q22Sql: String =
    """SELECT o_custkey, o_orderkey, o_orderdate,
      |  sum(round(o_totalprice * 100)) OVER (
      |    PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) / 100.0 AS running_spend
      |FROM orders WHERE o_custkey < 100
      |ORDER BY o_custkey, o_orderdate, o_orderkey""".stripMargin

  // ── q23: gap-based sessionization of the events stream (30-min
  //         inactivity gap), batch form: lag → new-session marker →
  //         running count = session id → per-session rollup. Timestamps
  //         diffed in exact integer microseconds (unix_micros ≡ DuckDB
  //         epoch_us). The streaming form of the same semantics lives in
  //         graft.streaming (flatMapGroupsWithState).
  def q23(s: SparkSession, dir: String): DataFrame = {
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val gapUs = 30L * 60 * 1000000
    events(s, dir)
      .withColumn("prev_us", lag(unix_micros(col("ts")), 1).over(byUser))
      .withColumn("new_session",
        when(col("prev_us").isNull ||
          unix_micros(col("ts")) - col("prev_us") > gapUs, 1L).otherwise(0L))
      .withColumn("session_id",
        sum(col("new_session")).over(
          byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"), col("session_id"))
      .agg(
        count(lit(1)).as("n_events"),
        min(col("ts")).as("session_start"),
        max(col("ts")).as("session_end"),
        (max(unix_micros(col("ts"))) - min(unix_micros(col("ts"))))
          .as("duration_us"))
      .orderBy(col("user_id"), col("session_id"))
  }

  val q23Sql: String =
    """WITH marked AS (
      |  SELECT user_id, event_id, ts,
      |    CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
      |           OR epoch_us(ts) - lag(epoch_us(ts)) OVER w > 1800000000
      |         THEN 1 ELSE 0 END AS new_session
      |  FROM events
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
      |sessions AS (
      |  SELECT user_id, ts,
      |    CAST(sum(new_session) OVER (
      |      PARTITION BY user_id ORDER BY ts, event_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
      |  FROM marked)
      |SELECT user_id, session_id, count(*) AS n_events,
      |  min(ts) AS session_start, max(ts) AS session_end,
      |  max(epoch_us(ts)) - min(epoch_us(ts)) AS duration_us
      |FROM sessions GROUP BY user_id, session_id
      |ORDER BY user_id, session_id""".stripMargin

  // ── q43: native session_window operator — the Spark-first form of q23's
  //        manual lag/cumsum sessionizer (and the one that also works under
  //        Structured Streaming with watermark-bounded state). Session
  //        bounds: start = first event, end = last event + gap. Oracled by
  //        the same gap-walk SQL as q23.
  def q43(s: SparkSession, dir: String): DataFrame =
    events(s, dir)
      .groupBy(col("user_id"), session_window(col("ts"), "30 minutes").as("sw"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"), col("sw.start").as("session_start"),
        col("sw.end").as("session_end_w"), col("n_events"))
      .orderBy(col("user_id"), col("session_start"))

  val q43Sql: String =
    """WITH marked AS (
      |  SELECT user_id, event_id, ts,
      |    CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
      |           OR epoch_us(ts) - lag(epoch_us(ts)) OVER w > 1800000000
      |         THEN 1 ELSE 0 END AS new_session
      |  FROM events
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
      |sessions AS (
      |  SELECT user_id, ts,
      |    CAST(sum(new_session) OVER (
      |      PARTITION BY user_id ORDER BY ts, event_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS sid
      |  FROM marked)
      |SELECT user_id, min(ts) AS session_start,
      |  max(ts) + INTERVAL 30 MINUTE AS session_end_w,
      |  count(*) AS n_events
      |FROM sessions GROUP BY user_id, sid
      |ORDER BY user_id, session_start""".stripMargin

  // ── q44: the q21 grouped top-n via the custom TopKPerKey operator
  //        (logical node + strategy + bounded-heap exec,
  //        org.apache.spark.sql.graft.TopKPerKey) — no per-partition sort,
  //        no Window; oracled by the same row_number SQL as q21.
  def q44(s: SparkSession, dir: String): DataFrame =
    org.apache.spark.sql.graft.TopKPerKey.of(orders(s, dir),
        keys = Seq("o_orderpriority"),
        orderBy = Seq("o_totalprice" -> false, "o_orderkey" -> true), k = 3)
      .select(col("o_orderpriority"), col("o_orderkey"), col("o_totalprice"))
      .orderBy(col("o_orderpriority"), desc("o_totalprice"), col("o_orderkey"))

  val q44Sql: String =
    """SELECT o_orderpriority, o_orderkey, o_totalprice FROM (
      |  SELECT o_orderpriority, o_orderkey, o_totalprice,
      |    row_number() OVER (PARTITION BY o_orderpriority
      |                       ORDER BY o_totalprice DESC, o_orderkey) AS rn
      |  FROM orders) t
      |WHERE rn <= 3
      |ORDER BY o_orderpriority, o_totalprice DESC, o_orderkey""".stripMargin

  // ── q90: analytic-function completeness in one suite — lag/lead
  //        neighbors, exact-cents delta to the previous row, percent_rank
  //        and cume_dist. All rank fractions are divisions of identical
  //        integers on both engines (k/(n−1), k/n), so the doubles are
  //        bit-equal without rounding. One shuffle per partition key, the
  //        standard distributed window shape.
  def q90(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_orderpriority"))
      .orderBy(col("o_totalprice"), col("o_orderkey"))
    orders(s, dir)
      .select(col("o_orderkey"), col("o_orderpriority"),
        lag(col("o_orderkey"), 1).over(w).as("prev_key"),
        lead(col("o_orderkey"), 1).over(w).as("next_key"),
        ((cents(col("o_totalprice"))
          - lag(cents(col("o_totalprice")), 1).over(w)) / 100.0)
          .as("delta_prev"),
        percent_rank().over(w).as("pr"),
        cume_dist().over(w).as("cd"))
      .orderBy(col("o_orderkey"))
  }

  val q90Sql: String =
    """SELECT o_orderkey, o_orderpriority,
      |  lag(o_orderkey) OVER w AS prev_key,
      |  lead(o_orderkey) OVER w AS next_key,
      |  (round(o_totalprice * 100) - lag(round(o_totalprice * 100)) OVER w)
      |    / 100.0 AS delta_prev,
      |  percent_rank() OVER w AS pr,
      |  cume_dist() OVER w AS cd
      |FROM orders
      |WINDOW w AS (PARTITION BY o_orderpriority
      |             ORDER BY o_totalprice, o_orderkey)
      |ORDER BY o_orderkey""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q90_window_suite" -> q90,
    "q21_window_topn" -> q21,
    "q22_window_running" -> q22,
    "q23_sessionize" -> q23,
    "q43_session_window" -> q43,
    "q44_topk_custom" -> q44)

  val oracle: Map[String, String] = Map(
    "q90_window_suite" -> q90Sql,
    "q21_window_topn" -> q21Sql,
    "q22_window_running" -> q22Sql,
    "q23_sessionize" -> q23Sql,
    "q43_session_window" -> q43Sql,
    "q44_topk_custom" -> q44Sql)
}
