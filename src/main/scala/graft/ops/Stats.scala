package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables._

/** Distribution statistics (SURVEY.md §2.5 aggregation family, extended):
  * exact quantiles for the oracle/audit path, sketch quantiles for the
  * 100 TB path.
  *
  * `percentile` (exact) buffers each group's values — fine for bounded
  * group counts (here: 3 return flags over the whole fact table, one
  * shuffle on the group key). At 100 TB the registered scale form is
  * `approx_percentile` (GK sketch: mergeable, bounded memory, map-side
  * partials) — `approxQuantiles` below, with StatsSpec pinning the sketch
  * error against the exact path on the fixture.
  *
  * Float parity: p ∈ {.25,.5,.75,.99} over 2-decimal prices interpolates
  * to ≤4 decimals exactly, so round-to-4 makes Spark and DuckDB
  * (`quantile_cont`, same rank = p·(n−1) linear interpolation) bit-equal.
  */
object Stats {

  private def r4(c: org.apache.spark.sql.Column) =
    round(c * 10000) / 10000.0

  def q75(s: SparkSession, dir: String): DataFrame = {
    // The NATURAL four-call form a SQL user writes. The MergePercentiles
    // optimizer rule fuses the four buffering aggregates into one
    // array-percentile (4.1s → 1.7s at sf0.1) — the query stays readable,
    // the engine does the fusion.
    org.apache.spark.sql.graft.MergePercentiles.ensure(s)
    lineitem(s, dir)
      .groupBy(col("l_returnflag"))
      .agg(
        count(lit(1)).as("n_items"),
        r4(expr("percentile(l_extendedprice, 0.25)")).as("p25"),
        r4(expr("percentile(l_extendedprice, 0.5)")).as("p50"),
        r4(expr("percentile(l_extendedprice, 0.75)")).as("p75"),
        r4(expr("percentile(l_extendedprice, 0.99)")).as("p99"))
      .orderBy(col("l_returnflag"))
  }

  val q75Sql: String =
    """SELECT l_returnflag, count(*) AS n_items,
      |  round(quantile_cont(l_extendedprice, 0.25) * 10000) / 10000.0 AS p25,
      |  round(quantile_cont(l_extendedprice, 0.5) * 10000) / 10000.0 AS p50,
      |  round(quantile_cont(l_extendedprice, 0.75) * 10000) / 10000.0 AS p75,
      |  round(quantile_cont(l_extendedprice, 0.99) * 10000) / 10000.0 AS p99
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  /** Sketch quantiles — the registered 100 TB path (bounded-memory GK,
    * map-side partial merge). `accuracy` trades memory for rank error
    * (1/accuracy of the rank). */
  def approxQuantiles(df: DataFrame, valueCol: String, groupCol: String,
      ps: Seq[Double], accuracy: Int = 10000): DataFrame =
    df.groupBy(col(groupCol))
      .agg(percentile_approx(col(valueCol),
        array(ps.map(lit): _*), lit(accuracy)).as("qs"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q75_exact_quantiles" -> q75)

  val oracle: Map[String, String] = Map(
    "q75_exact_quantiles" -> q75Sql)
}
