package graft

import org.apache.spark.sql.functions._
import graft.api.Endpoints
import graft.api.Endpoints.FlightsParams
import graft.ops.Cleaning

class EndpointsSpec extends SparkTestBase {
  import spark.implicits._

  private lazy val orders = Tables.orders(spark, sfDir)

  test("X3: raw BTS date format parses ('1/1/2024 12:00:00 AM')") {
    val out = Seq("1/1/2024 12:00:00 AM", "12/31/2023 11:59:00 PM")
      .toDF("FL_DATE")
      .select(Cleaning.parseFlightDate(col("FL_DATE")).cast("string"))
      .collect().map(_.getString(0))
    assert(out.toSeq == Seq("2024-01-01", "2023-12-31"))
  }

  test("/api/flights: filters + cursor + clamp behave like the reference") {
    val r1 = Endpoints.flights(orders, "o_orderdate", "o_orderkey",
      "o_orderstatus", "o_orderpriority",
      FlightsParams(startDate = Some("1996-01-01 00:00:00"),
        endDate = Some("1998-12-31 00:00:00"),
        origin = Some("o"), limit = 40))
    assert(r1.pageCount == 40 && r1.totalCount > 40)
    assert(r1.nextCursor.isDefined)
    // second page continues where the first ended, no overlap
    val r2 = Endpoints.flights(orders, "o_orderdate", "o_orderkey",
      "o_orderstatus", "o_orderpriority",
      FlightsParams(startDate = Some("1996-01-01 00:00:00"),
        endDate = Some("1998-12-31 00:00:00"),
        origin = Some("o"), cursor = r1.nextCursor, limit = 40))
    val k1 = r1.flights.map(_.getAs[Long]("o_orderkey")).toSet
    val k2 = r2.flights.map(_.getAs[Long]("o_orderkey")).toSet
    assert(k1.intersect(k2).isEmpty)
    assert(r2.totalCount == r1.totalCount)
  }

  test("/api/metrics: wide single-pass summary") {
    val m = Endpoints.metrics(orders, "o_orderdate", "o_totalprice",
      "x", "y", delayThreshold = 300000).head()
    assert(m.getAs[Long]("total_flights") == orders.count())
    assert(m.getAs[Double]("delay_rate") > 0)
  }

  test("/api/metrics top routes + /api/airports shapes") {
    val li = Tables.lineitem(spark, sfDir)
    val routes = Endpoints.topRoutes(li, "l_returnflag", "l_linestatus")
    assert(routes.count() == 5)
    val airports = Endpoints.airports(li, "l_suppkey", "l_partkey")
    assert(airports.columns.toSeq == Seq("airport"))
    assert(airports.count() > 0)
  }
}
