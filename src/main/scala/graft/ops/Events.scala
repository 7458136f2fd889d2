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

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q24_events_hourly" -> q24,
    "q25_events_json" -> q25)

  val oracle: Map[String, String] = Map(
    "q24_events_hourly" -> q24Sql,
    "q25_events_json" -> q25Sql)
}
