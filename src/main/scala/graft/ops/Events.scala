package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables._
import graft.Fns._

/** Event-stream queries in batch form (the reference's "real-time
  * processing" TODO, README.md:114). The same logic runs as Structured
  * Streaming in graft.streaming.EventsStream — watermark + tumbling window;
  * here it is phrased as date_trunc so DuckDB can oracle it.
  */
object Events {

  // ── q24: tumbling-window rollup (1h) per event type — count, exact-cents
  //         value sum, exact mean. One hash aggregate; at scale the input
  //         would be partitioned by date so the window key aligns with
  //         partition pruning.
  def q24(s: SparkSession, dir: String): DataFrame =
    events(s, dir)
      .groupBy(date_trunc("hour", col("ts")).as("hour_start"), col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        (sum(cents(col("value"))) / 100.0).as("sum_value"),
        (sum(cents(col("value"))) / count(lit(1)) / 100.0).as("avg_value"))
      .orderBy(col("hour_start"), col("event_type"))

  val q24Sql: String =
    """SELECT date_trunc('hour', ts) AS hour_start, event_type,
      |  count(*) AS n_events,
      |  sum(round("value" * 100)) / 100.0 AS sum_value,
      |  sum(round("value" * 100)) / count(*) / 100.0 AS avg_value
      |FROM events GROUP BY 1, 2 ORDER BY hour_start, event_type""".stripMargin

  // ── q25: semi-structured extraction — JSON path into the props column
  //         (get_json_object ≡ DuckDB json_extract_string), then aggregate.
  //         Codegen-friendly: no UDF, stays inside WholeStageCodegen.
  def q25(s: SparkSession, dir: String): DataFrame =
    events(s, dir)
      .withColumn("k", get_json_object(col("props"), "$.k").cast("long"))
      .groupBy(col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        sum(col("k")).as("sum_k"),
        min(col("k")).as("min_k"),
        max(col("k")).as("max_k"),
        count(when(col("k").isNull, 1)).as("null_k"))
      .orderBy(col("event_type"))

  val q25Sql: String =
    """SELECT event_type, count(*) AS n_events,
      |  CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
      |  min(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS min_k,
      |  max(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k,
      |  count(CASE WHEN json_extract_string(props, '$.k') IS NULL THEN 1 END) AS null_k
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin

  // ── q50: statistical outlier detection — per-type mean/stddev from
  //        EXACT integer-cents sums (sum and sum-of-squares are
  //        order-independent; the derived mean/variance/threshold are then
  //        identical double arithmetic in both engines), plus the count of
  //        |v − μ| > 3σ events. The two-pass shape (stats → rejoin) is the
  //        standard distributed z-score filter.
  def q50(s: SparkSession, dir: String): DataFrame = {
    val ev = events(s, dir).withColumn("vc", round(col("value") * 100))
    val stats = ev.groupBy(col("event_type").as("et"))
      .agg(count(lit(1)).as("n"),
        sum(col("vc")).as("sum_c"),
        sum(col("vc") * col("vc")).as("sumsq_c"))
      .select(col("et"), col("n"),
        (col("sum_c") / col("n")).as("mean_c"),
        sqrt((col("sumsq_c") - col("sum_c") * col("sum_c") / col("n")) / (col("n") - 1))
          .as("sd_c"))
    ev.join(stats, col("event_type") === col("et"))
      .groupBy(col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        (round(min(col("mean_c")) * 100) / 100.0 / 100.0).as("mean_value"),
        (round(min(col("sd_c")) * 100) / 100.0 / 100.0).as("sd_value"),
        count(when(abs(col("vc") - col("mean_c")) > col("sd_c") * 3, 1))
          .as("n_outliers"))
      .orderBy(col("event_type"))
  }

  val q50Sql: String =
    """WITH ev AS (
      |  SELECT event_type, round("value" * 100) AS vc FROM events),
      |stats AS (
      |  SELECT event_type AS et, count(*) AS n,
      |    sum(vc) / count(*) AS mean_c,
      |    sqrt((sum(vc * vc) - sum(vc) * sum(vc) / count(*)) / (count(*) - 1)) AS sd_c
      |  FROM ev GROUP BY event_type)
      |SELECT event_type, count(*) AS n_events,
      |  round(min(mean_c) * 100) / 100.0 / 100.0 AS mean_value,
      |  round(min(sd_c) * 100) / 100.0 / 100.0 AS sd_value,
      |  count(CASE WHEN abs(vc - mean_c) > sd_c * 3 THEN 1 END) AS n_outliers
      |FROM ev JOIN stats ON event_type = et
      |GROUP BY event_type ORDER BY event_type""".stripMargin

  // ── q78: HOPPING-window rollup — 1-hour windows sliding every 15 min
  //         (each event lands in exactly 4 windows). Spark's `window()`
  //         generator is the native form (and runs unchanged under
  //         Structured Streaming with a watermark); the oracle replays the
  //         same epoch-aligned window algebra with an explicit k ∈ [0,4)
  //         expansion. Scale shape: a 4× narrow row expansion feeding one
  //         hash aggregate — partial aggregation absorbs the fan-out
  //         map-side, so the shuffle carries one row per (window, partial).
  def q78(s: SparkSession, dir: String): DataFrame =
    events(s, dir)
      .groupBy(window(col("ts"), "1 hour", "15 minutes"))
      .agg(
        count(lit(1)).as("n_events"),
        (sum(cents(col("value"))) / 100.0).as("total_value"))
      .select(col("window.start").as("win_start"), col("n_events"),
        col("total_value"))
      .orderBy(col("win_start"))

  val q78Sql: String =
    """WITH hops AS (
      |  SELECT value,
      |    make_timestamp((CAST(floor(epoch_us(ts) / 900000000) AS BIGINT) - k)
      |      * 900000000) AS win_start
      |  FROM events, range(0, 4) t(k))
      |SELECT win_start, count(*) AS n_events,
      |  sum(round("value" * 100)) / 100.0 AS total_value
      |FROM hops GROUP BY 1 ORDER BY win_start""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q78_hopping_window" -> q78,
    "q24_events_hourly" -> q24,
    "q25_events_json" -> q25,
    "q50_value_outliers" -> q50)

  val oracle: Map[String, String] = Map(
    "q78_hopping_window" -> q78Sql,
    "q24_events_hourly" -> q24Sql,
    "q25_events_json" -> q25Sql,
    "q50_value_outliers" -> q50Sql)
}
