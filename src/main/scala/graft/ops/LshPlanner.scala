package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** MinHash-LSH parameter planning — the sizing utility a 100 TB dedup run
  * needs BEFORE it runs: given the engine's 64-permutation signature
  * budget (graft.operators.Dedup), pick the banding (b bands × r rows,
  * b·r = 64) whose S-curve midpoint sits closest to each target Jaccard
  * threshold, and report the collision probabilities that choice implies
  * (P(candidate | s) = 1 − (1 − s^r)^b; Leskovec/Rajaraman/Ullman,
  * "Mining of Massive Datasets" §3.4 — public construction).
  *
  * Midpoint is the EXACT P = 1/2 solution s₅₀ = (1 − 2^(−1/b))^(1/r),
  * not the (1/b)^(1/r) approximation. The argmin runs on a 1e-7
  * fixed-point distance (the q120 float discipline) so engine ulp noise
  * cannot flip the selection; candidate midpoints are ≥ 0.01 apart.
  *
  * This is a constant-space analytic query (7 factorizations × 5
  * targets) — registered not for throughput but because the planner is
  * part of the operator surface: its output is what q34/q49/q103 should
  * be CONFIGURED with at a given similarity bar.
  */
object LshPlanner {

  /** The 64-permutation budget of the Dedup minhash family. */
  val Perms = 64

  // ── q174: banding planner — for each target threshold, the (b, r)
  //        factorization of the 64-perm budget with the nearest S-curve
  //        midpoint, plus the operating probabilities: P(candidate) at
  //        the threshold itself, at threshold−0.2 (the false-positive
  //        band the verifier must filter), and the MISS rate at
  //        threshold+0.1 (true near-dups the banding never pairs).
  def q174(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val cand = Seq(1, 2, 4, 8, 16, 32, 64)
      .map(b => (b.toLong, (Perms / b).toLong)).toDF("b", "r")
    val taus = Seq(0.5, 0.6, 0.7, 0.8, 0.9).toDF("tau")
    val scored = cand.crossJoin(taus)
      .withColumn("s50",
        expr("pow(1.0 - pow(0.5, 1.0 / b), 1.0 / r)"))
      .withColumn("dist_e7",
        expr("CAST(round(abs(s50 - tau) * 10000000) AS BIGINT)"))
      .withColumn("p_tau",
        expr("round((1.0 - pow(1.0 - pow(tau, r), b)) * 10000) / 10000.0"))
      .withColumn("p_fp",
        expr("round((1.0 - pow(1.0 - pow(tau - 0.2, r), b)) * 10000) / 10000.0"))
      .withColumn("p_miss",
        expr("round(pow(1.0 - pow(tau + 0.1, r), b) * 10000) / 10000.0"))
      .withColumn("s50_r",
        expr("round(s50 * 10000) / 10000.0"))
    scored.groupBy(col("tau"))
      .agg(min(struct(col("dist_e7"), col("r"), col("b"), col("s50_r"),
        col("p_tau"), col("p_fp"), col("p_miss"))).as("best"))
      .select(col("tau"), col("best.b").as("bands"),
        col("best.r").as("rows_per_band"), col("best.s50_r").as("s50"),
        col("best.p_tau").as("p_at_tau"), col("best.p_fp").as("p_fp_lo"),
        col("best.p_miss").as("p_miss_hi"))
      .orderBy(col("tau"))
  }

  val q174Sql: String =
    """WITH cand AS (
      |  SELECT CAST(b AS BIGINT) AS b, CAST(64 // b AS BIGINT) AS r
      |  FROM (VALUES (1), (2), (4), (8), (16), (32), (64)) t(b)),
      |tt AS (SELECT unnest([0.5, 0.6, 0.7, 0.8, 0.9]) AS tau),
      |y AS (
      |  SELECT tau, b, r,
      |    pow(1.0 - pow(0.5, 1.0 / b), 1.0 / r) AS s50,
      |    CAST(round(abs(pow(1.0 - pow(0.5, 1.0 / b), 1.0 / r) - tau)
      |      * 10000000) AS BIGINT) AS dist_e7,
      |    round((1.0 - pow(1.0 - pow(tau, r), b)) * 10000) / 10000.0
      |      AS p_tau,
      |    round((1.0 - pow(1.0 - pow(tau - 0.2, r), b)) * 10000) / 10000.0
      |      AS p_fp,
      |    round(pow(1.0 - pow(tau + 0.1, r), b) * 10000) / 10000.0
      |      AS p_miss
      |  FROM cand CROSS JOIN tt),
      |best AS (
      |  SELECT *, row_number() OVER (PARTITION BY tau
      |    ORDER BY dist_e7, r, b) AS rn FROM y)
      |SELECT tau, b AS bands, r AS rows_per_band,
      |  round(s50 * 10000) / 10000.0 AS s50,
      |  p_tau AS p_at_tau, p_fp AS p_fp_lo, p_miss AS p_miss_hi
      |FROM best WHERE rn = 1 ORDER BY tau""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q174_lsh_planner" -> q174)

  val oracle: Map[String, String] = Map(
    "q174_lsh_planner" -> q174Sql)
}
