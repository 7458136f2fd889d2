package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Flight-domain cleaning/projection library — the reference's ingestion +
  * processing semantics (SURVEY.md §2.2, §2.8) as reusable column
  * transforms. All pure Catalyst expressions (no UDFs): the only row-wise
  * Python function in the reference, clean_time
  * (data_processing/process.py:40-47), is expressible as lpad/substring.
  */
object Cleaning {

  /** X1 clean_time: float HHMM (e.g. 1456.0) → "14:56"; null-safe.
    * Mirrors data_processing/process.py:40-47 (zfill(4) + slice). */
  def cleanTime(c: Column): Column = {
    val t = lpad(c.cast("int").cast("string"), 4, "0")
    when(c.isNull, lit(null).cast("string"))
      .otherwise(concat(substring(t, 1, 2), lit(":"), substring(t, 3, 2)))
  }

  /** X3: parse the raw BTS FL_DATE format `M/d/yyyy hh:mm:ss a`
    * (e.g. "1/1/2024 12:00:00 AM" — data/raw/flight_data.csv:2;
    * parsed at data_processing/process.py:37) to DateType. */
  def parseFlightDate(c: Column): Column =
    to_date(to_timestamp(c, "M/d/yyyy hh:mm:ss a"))

  /** P1 project+rename: select a column subset with new names
    * (data_ingestion/ingest.py:314-333). */
  def projectRename(df: DataFrame, mapping: Seq[(String, String)]): DataFrame =
    df.select(mapping.map { case (raw, out) => col(raw).as(out) }: _*)

  /** The reference's 9-column ingestion mapping
    * (data_ingestion/ingest.py:314-324). */
  val flightColumnMapping: Seq[(String, String)] = Seq(
    "FL_DATE" -> "flight_date",
    "OP_CARRIER" -> "airline",
    "OP_CARRIER_FL_NUM" -> "flight_number",
    "ORIGIN" -> "origin",
    "DEST" -> "destination",
    "CRS_DEP_TIME" -> "scheduled_departure",
    "DEP_TIME" -> "actual_departure",
    "CRS_ARR_TIME" -> "scheduled_arrival",
    "ARR_TIME" -> "actual_arrival")

  /** P2: drop columns whose missing-% exceeds `thresholdPct`
    * (data_processing/process.py:23-34). Two passes: one single-pass agg
    * for the profile, then a projection — at scale the agg is one
    * shuffle-free partial+final pass over all columns at once.
    */
  def dropHighMissing(df: DataFrame, thresholdPct: Double): DataFrame = {
    if (df.isEmpty) return df
    val profile = df
      .select(df.columns.toIndexedSeq.map(c =>
        (avg(col(c).isNull.cast("double")) * 100).as(c)): _*)
      .head()
    val bad = df.columns.filter(c => profile.getAs[Double](c) > thresholdPct)
    df.drop(bad.toIndexedSeq: _*)
  }

  /** X10: nulls→0 for the delay/flag columns
    * (data_processing/process.py:54-64). */
  def fillZero(df: DataFrame, cols: Seq[String]): DataFrame =
    df.na.fill(0.0, cols)

  /** X2: uppercase airport codes (data_processing/process.py:50-51). */
  def upperCodes(df: DataFrame, cols: Seq[String]): DataFrame =
    cols.foldLeft(df)((d, c) => d.withColumn(c, upper(col(c))))

  /** X6+X7+X9: derived delay columns + status label
    * (data_processing/process.py:163-168). The delay is the reference's
    * intentional naive HHMM subtraction (1456−1405 = 51 "minutes") —
    * replicated, not fixed (SURVEY.md §7.5).
    */
  def addDelayAndStatus(df: DataFrame, delayThreshold: Double = 15.0): DataFrame =
    df.withColumn("departure_delay",
        col("actual_departure").cast("double") -
          col("scheduled_departure").cast("double"))
      .withColumn("arrival_delay",
        col("actual_arrival").cast("double") -
          col("scheduled_arrival").cast("double"))
      .withColumn("flight_status",
        when(col("departure_delay") > delayThreshold, "Delayed")
          .otherwise("On Time"))

  /** X14: isoformat generation stamps — the reference marks every metrics
    * artifact with `datetime.now().isoformat()`
    * (dags/flight_data_pipeline.py:169,215,241). Deliberately excluded
    * from all oracle queries (a wall-clock column can never hash-match);
    * format pinned to Python's isoformat microsecond shape.
    */
  def stampGenerated(df: DataFrame, colName: String = "generated_at"): DataFrame =
    df.withColumn(colName,
      date_format(current_timestamp(), "yyyy-MM-dd'T'HH:mm:ss.SSSSSS"))

  /** Full ingest→process chain (reference DAG stages 1–2, SURVEY.md §3.1)
    * as one lazy narrow plan — no intermediate materialization.
    */
  def ingestAndProcess(raw: DataFrame, delayThreshold: Double = 15.0): DataFrame = {
    val projected = projectRename(raw, flightColumnMapping)
    addDelayAndStatus(upperCodes(projected, Seq("origin", "destination")),
      delayThreshold)
  }
}
