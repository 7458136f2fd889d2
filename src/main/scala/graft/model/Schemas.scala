package graft.model

import org.apache.spark.sql.types._

/** Explicit schemas + typed row models (SURVEY.md §1). The engine never
  * infers schemas on its read path (§1.3): CSV/JSON sources declare these
  * StructTypes; parquet fixtures carry their own footers.
  */
object Schemas {

  /** The consumed subset of the 87-column BTS on-time CSV (FIXTURES.md §A1;
    * reference mapping data_ingestion/ingest.py:314-324 + cleaning dtypes
    * data_processing/process.py:98-108). Remaining columns are mostly-null
    * padding handled generically by Cleaning.dropHighMissing. */
  val rawFlightSchema: StructType = StructType(Seq(
    StructField("FL_DATE", StringType),          // M/d/yyyy hh:mm:ss a
    StructField("OP_CARRIER", StringType),
    StructField("OP_CARRIER_FL_NUM", IntegerType),
    StructField("ORIGIN", StringType),
    StructField("DEST", StringType),
    StructField("CRS_DEP_TIME", IntegerType),    // HHMM
    StructField("DEP_TIME", DoubleType),         // HHMM, nullable
    StructField("CRS_ARR_TIME", IntegerType),
    StructField("ARR_TIME", DoubleType),
    StructField("DEP_DELAY", DoubleType),
    StructField("ARR_DELAY", DoubleType),
    StructField("CANCELLED", DoubleType),        // 0.0/1.0, range-gated V4
    StructField("DIVERTED", DoubleType)))

  /** Processed flight row (FIXTURES.md §A3 final_flights / Postgres DDL
    * dags/flight_data_pipeline.py:81-96). */
  final case class Flight(
      flight_date: String,
      airline: String,
      flight_number: Int,
      origin: String,
      destination: String,
      scheduled_departure: String,
      actual_departure: Option[String],
      scheduled_arrival: String,
      actual_arrival: Option[String],
      departure_delay: Option[Double],
      arrival_delay: Option[Double],
      flight_status: String)

  /** Weather document (data/raw/weather_data.json; validated
    * ingest.py:96-100). */
  val weatherSchema: StructType = StructType(Seq(
    StructField("stations", ArrayType(StructType(Seq(
      StructField("id", StringType),
      StructField("temperature", LongType),
      StructField("conditions", StringType)))))))

  final case class Station(id: String, temperature: Long, conditions: String)
}
