package graft.sql

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.Tables

/** SQL surface: fixture tables as temp views + the reference's two
  * analytic SQL queries (the only SQL in the reference repo,
  * dags/flight_data_pipeline.py:136-158 and :191-203) run by OUR engine
  * via spark.sql — the "load to Postgres then query" boundary collapsed
  * in-engine (SURVEY.md §3.1 stage 3–4). Equivalence with the DataFrame
  * forms (RefQueries.q02/q03) is asserted in SqlSpec.
  */
object Views {

  val tableNames: Seq[String] = Seq("region", "nation", "customer",
    "supplier", "part", "orders", "lineitem", "events", "documents",
    "embeddings")

  /** Register every fixture table as a temp view (the engine-side
    * equivalent of the reference's warehouse load). events goes through
    * its dedicated loader (ns-timestamp conversion). */
  def registerAll(spark: SparkSession, dir: String): Unit =
    tableNames.foreach {
      case "events" => Tables.events(spark, dir).createOrReplaceTempView("events")
      case t => Tables.table(spark, dir, t).createOrReplaceTempView(t)
    }

  /** Per-carrier performance metrics via SQL (CTE shape J1). */
  def performanceMetricsSql(spark: SparkSession): DataFrame =
    spark.sql(
      """WITH carrier_stats AS (
        |  SELECT o_orderpriority,
        |    count(*) AS total_flights,
        |    sum(round(o_totalprice * 100)) / count(*) / 100.0 AS avg_price,
        |    count(CASE WHEN o_orderstatus = 'F' THEN 1 END) AS delayed_flights,
        |    count(CASE WHEN o_orderstatus = 'O' THEN 1 END) AS ontime_flights
        |  FROM orders GROUP BY o_orderpriority)
        |SELECT o_orderpriority, total_flights, avg_price, delayed_flights,
        |  ontime_flights,
        |  round(ontime_flights / total_flights * 100 * 100) / 100.0 AS ontime_percentage
        |FROM carrier_stats
        |ORDER BY total_flights DESC, o_orderpriority""".stripMargin)

  /** Route analysis via SQL (A6/A3/F5/A9/O5 shape). */
  def routeAnalysisSql(spark: SparkSession): DataFrame =
    spark.sql(
      """WITH route_stats AS (
        |  SELECT l_returnflag, l_linestatus,
        |    count(*) AS total_flights,
        |    sum(round(l_discount * 100)) / count(*) / 100.0 AS avg_discount,
        |    count(CASE WHEN l_discount > 0.05 THEN 1 END) AS delayed_flights
        |  FROM lineitem GROUP BY l_returnflag, l_linestatus)
        |SELECT concat_ws('-', l_returnflag, l_linestatus) AS route,
        |  total_flights, avg_discount, delayed_flights,
        |  round((total_flights - delayed_flights) / total_flights * 100 * 100) / 100.0 AS ontime_percentage
        |FROM route_stats
        |ORDER BY total_flights DESC, route""".stripMargin)
}
