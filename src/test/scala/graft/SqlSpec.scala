package graft

import graft.sql.Views

/** The SQL surface must agree with the DataFrame surface row-for-row. */
class SqlSpec extends SparkTestBase {

  test("spark.sql performance metrics ≡ DataFrame q02") {
    Views.registerAll(spark, sfDir)
    val viaSql = Views.performanceMetricsSql(spark).collect().toSeq
    val viaDf = graft.ops.RefQueries.q02(spark, sfDir).collect().toSeq
    assert(viaSql == viaDf)
  }

  test("spark.sql route analysis ≡ DataFrame q03") {
    Views.registerAll(spark, sfDir)
    val viaSql = Views.routeAnalysisSql(spark).collect().toSeq
    val viaDf = graft.ops.RefQueries.q03(spark, sfDir).collect().toSeq
    assert(viaSql == viaDf)
  }

  test("cosine_sim is SQL-callable after registration") {
    graft.functions.CosineSim.register(spark)
    val v = spark.sql(
      "SELECT cosine_sim(array(1.0d, 2.0d), array(2.0d, 4.0d)) AS c")
      .head().getDouble(0)
    assert(math.abs(v - 1.0) < 1e-12)
  }

  test("typed Dataset[Flight] round-trip through the processed schema") {
    import spark.implicits._
    import graft.model.Schemas.Flight
    val ds = Seq(
      Flight("2024-01-01", "AA", 100, "JFK", "LAX", "09:00",
        Some("09:30"), "12:00", Some("12:16"), Some(30.0), Some(16.0), "Delayed"),
      Flight("2024-01-02", "DL", 200, "DTW", "JFK", "08:00",
        None, "11:00", None, None, None, "On Time")).toDS()
    val delayed = ds.filter(_.flight_status == "Delayed").collect()
    assert(delayed.length == 1 && delayed.head.airline == "AA")
    assert(ds.toDF().schema.fieldNames.contains("departure_delay"))
  }
}
