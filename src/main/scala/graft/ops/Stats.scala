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

  // ── q127: incremental statistics maintenance — the pattern that keeps a
  //         corpus dashboard current at 100 TB without rescanning history:
  //         count/sum/min/max (and any algebraic aggregate) are MERGEABLE,
  //         so the stats of (history ∪ batch) are a pure combination of
  //         each side's partial aggregates. Here the "history" partials
  //         (doc_id % 7 != 0) and the "new batch" partials (% 7 == 0) are
  //         aggregated independently — in production the history side is a
  //         tiny stored stats table, never re-scanned — and merged with a
  //         full-outer join + componentwise combine. THE ORACLE IS THE
  //         DIRECT FULL-TABLE AGGREGATION: the driver's hash compare
  //         proves merge(partials) ≡ aggregate(whole), the property that
  //         makes the incremental path safe to trust.
  def q127(s: SparkSession, dir: String): DataFrame = {
    def partial(df: DataFrame): DataFrame =
      df.groupBy(col("source")).agg(
        count(lit(1)).as("n_docs"), sum(col("n_chars")).as("sum_chars"),
        min(col("n_chars")).as("min_chars"),
        max(col("n_chars")).as("max_chars"))
    val docs = documents(s, dir).select(col("source"), col("doc_id"),
      col("n_chars"))
    val hist = partial(docs.where(col("doc_id") % 7 =!= 0))
      .select(col("source"), col("n_docs").as("hn"),
        col("sum_chars").as("hs"), col("min_chars").as("hmin"),
        col("max_chars").as("hmax"))
    val batch = partial(docs.where(col("doc_id") % 7 === 0))
      .select(col("source"), col("n_docs").as("bn"),
        col("sum_chars").as("bs"), col("min_chars").as("bmin"),
        col("max_chars").as("bmax"))
    hist.join(batch, Seq("source"), "full_outer")
      .select(col("source"),
        (coalesce(col("hn"), lit(0L)) + coalesce(col("bn"), lit(0L)))
          .as("n_docs"),
        (coalesce(col("hs"), lit(0L)) + coalesce(col("bs"), lit(0L)))
          .as("sum_chars"),
        // null-safe min/max merge: at least one side exists per row
        least(coalesce(col("hmin"), col("bmin")),
          coalesce(col("bmin"), col("hmin"))).as("min_chars"),
        greatest(coalesce(col("hmax"), col("bmax")),
          coalesce(col("bmax"), col("hmax"))).as("max_chars"))
      .select(col("source"), col("n_docs"), col("sum_chars"),
        col("min_chars"), col("max_chars"),
        (round(col("sum_chars").cast("double") / col("n_docs") * 10000)
          / 10000.0).as("avg_chars"))
      .orderBy(col("source"))
  }

  /** Deliberately the DIRECT aggregation — equality with the merged
    * partials is exactly the property under test. */
  val q127Sql: String =
    """SELECT source, count(*) AS n_docs,
      |  CAST(sum(n_chars) AS BIGINT) AS sum_chars,
      |  min(n_chars) AS min_chars, max(n_chars) AS max_chars,
      |  round(CAST(sum(n_chars) AS DOUBLE) / count(*) * 10000) / 10000.0
      |    AS avg_chars
      |FROM documents GROUP BY source ORDER BY source""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q75_exact_quantiles" -> q75,
    "q127_incremental_stats" -> q127)

  val oracle: Map[String, String] = Map(
    "q75_exact_quantiles" -> q75Sql,
    "q127_incremental_stats" -> q127Sql)
}
