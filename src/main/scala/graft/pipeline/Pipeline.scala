package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ops.{Cleaning, Validation}

/** End-to-end batch pipeline — the reference's 6-task Airflow DAG
  * (dags/flight_data_pipeline.py:271-328, SURVEY.md §3.1) as one
  * SparkSession program:
  *
  *   ingest → process → load (temp view) → [performance ∥ routes] → api
  *
  * Differences by design (SURVEY.md §4): stages 1–2 are one lazy narrow
  * plan (the reference writes CSV between every stage); the "load to
  * Postgres" boundary becomes a cached temp view (or `.write.jdbc` against
  * a real warehouse); the two analytic queries run in-engine instead of
  * being shipped to Postgres; the 4a∥4b fan-out is two actions on one
  * cached upstream.
  */
object Pipeline {

  final case class Outputs(
      flights: DataFrame,
      performanceMetrics: DataFrame,
      routeAnalysis: DataFrame,
      apiMetrics: DataFrame)

  /** Per-airline performance metrics — the reference's CTE query
    * (dags/flight_data_pipeline.py:136-158) in-engine: totals, avg delays,
    * delayed/on-time conditional counts, on-time percentage, rounded. */
  def performanceMetrics(flights: DataFrame): DataFrame =
    flights
      .groupBy(col("airline"))
      .agg(
        count(lit(1)).as("total_flights"),
        (round(avg(col("departure_delay")) * 100) / 100.0).as("avg_departure_delay"),
        (round(avg(col("arrival_delay")) * 100) / 100.0).as("avg_arrival_delay"),
        count(when(col("flight_status") === "Delayed", 1)).as("delayed_flights"),
        count(when(col("flight_status") === "On Time", 1)).as("ontime_flights"))
      .withColumn("ontime_percentage",
        when(col("total_flights") =!= 0,
          round(col("ontime_flights") / col("total_flights") * 100 * 100) / 100.0))
      .orderBy(desc("total_flights"), col("airline"))

  /** Per-route analysis (dags/flight_data_pipeline.py:191-203):
    * origin/destination grouping with delay averages + on-time pct. */
  def routeAnalysis(flights: DataFrame): DataFrame =
    flights
      .groupBy(col("origin"), col("destination"))
      .agg(
        count(lit(1)).as("total_flights"),
        (round(avg(col("departure_delay")) * 100) / 100.0).as("avg_departure_delay"),
        count(when(col("flight_status") === "Delayed", 1)).as("delayed_flights"))
      .withColumn("ontime_percentage",
        when(col("total_flights") =!= 0,
          round((col("total_flights") - col("delayed_flights")) /
            col("total_flights") * 100 * 100) / 100.0))
      .orderBy(desc("total_flights"), col("origin"), col("destination"))

  /** API metrics (dags/flight_data_pipeline.py:230-258): overall rollup of
    * the per-airline table (A5 second-level agg) + X15 threshold label. */
  def apiMetrics(perAirline: DataFrame): DataFrame =
    perAirline
      .agg(
        sum(col("total_flights")).as("total_flights"),
        sum(col("delayed_flights")).as("total_delayed_flights"),
        sum(col("ontime_flights")).as("total_ontime_flights"))
      .withColumn("overall_ontime_percentage",
        when(col("total_flights") =!= 0,
          round(col("total_ontime_flights") / col("total_flights") * 100 * 100) / 100.0))
      .withColumn("status",
        when(col("overall_ontime_percentage") > 80, "Good")
          .otherwise("Needs Improvement"))

  /** Validation gate mirroring process.py:78-123 before the analytic fan-out. */
  def validate(flights: DataFrame): Validation.Result =
    Validation.validateProcessed(flights,
      required = Seq("flight_date", "airline", "origin", "destination",
        "departure_delay", "arrival_delay", "flight_status"),
      critical = Seq("flight_date", "airline", "origin", "destination"),
      flagCols = Nil)

  /** Run the full DAG on a raw (87-column-style) flight frame. */
  def run(spark: SparkSession, raw: DataFrame,
      delayThreshold: Double = 15.0): Outputs = {
    // V1 file-content gate BEFORE any transform (ingest.py:63-114 order)
    val rawCheck = Validation.requireColumns(raw,
      Cleaning.flightColumnMapping.map(_._1))
    require(rawCheck.passed, s"ingest validation failed: ${rawCheck.errors.mkString("; ")}")
    val flights = Cleaning.ingestAndProcess(raw, delayThreshold).cache()
    flights.createOrReplaceTempView("flights")
    val v = validate(flights)
    require(v.passed, s"validation failed: ${v.errors.mkString("; ")}")
    val perf = performanceMetrics(flights)
    Outputs(flights, perf, routeAnalysis(flights), apiMetrics(perf))
  }
}
