package graft.sql

/** DuckDB-SQL generator replaying `graft.ops.Rhll` (the replayable HLL)
  * token-for-token — the `Xxh64Sql`/`BloomSql` discipline applied to the
  * sketch family: registers are `(group…, bucket, max rank)` rows derived
  * from the production hash (`Xxh64Sql.longHashCtes` for xxhash64 over
  * BIGINT keys, or the 60-bit md5-prefix digest), and the estimate is
  * exact integer arithmetic (HUGEINT scaled sums, `//` floor division)
  * with the linear-counting branch under round(x·10000)/10000.
  *
  * All arithmetic matches Rhll exactly: rank = bits+1 − bitlength(suffix)
  * via `length(bin(x))` (suffix 0 → bits+1); S scaled by 2^(bits+1) so the
  * per-register terms are integers; alpha_m as the rational
  * 7213·m/(10·(1000·m+1079)).
  */
object HllSql {
  val M: Long = graft.ops.Rhll.M // 2^P registers — single source of truth

  /** Shared linear-counting lookup CTE — emit ONCE per query (before any
    * estimate/sketch CTEs reference it): the exact ×10^4 integer table
    * `Rhll.lcX1e4` that the Spark plan embeds via typedlit, so both
    * engines read the SAME literal for m·ln(m/V) and no engine-local ln()
    * can diverge by a ulp. generate_subscripts is 1-based ⇒ v ranges
    * 1..m−1 in lock-step with unnest. */
  val lcCte: String =
    s"""hll_lc AS (
       |  SELECT generate_subscripts(l, 1) AS v, unnest(l) / 10000.0 AS lcv
       |  FROM (SELECT [${graft.ops.Rhll.lcX1e4.mkString(",")}] AS l))"""
      .stripMargin

  /** Register CTEs: `src` must select the group columns + an unsigned
    * 64-bit (or narrower, width = `bits`+12) hash `u`. Emits `<name>_h`
    * and `<name>(group…, bucket, r)`. */
  def regsCtes(name: String, src: String, groupCols: Seq[String],
      bits: Int): String = {
    val g = groupCols.mkString(", ")
    val mod = BigInt(2).pow(bits).toString
    s"""${name}_h AS (
       |  SELECT $g, u >> $bits AS bucket, u % $mod AS sfx FROM ($src)),
       |$name AS (
       |  SELECT $g, bucket,
       |    max(CASE WHEN sfx = 0 THEN ${bits + 1}
       |        ELSE ${bits + 1} - length(bin(sfx)) END) AS r
       |  FROM ${name}_h GROUP BY $g, bucket)""".stripMargin
  }

  /** Estimate CTEs over a register relation `regs`: emits `<prefix>_e1/2/3`
    * and `<prefix>(group…, <out>)` — Rhll.estimate verbatim. REQUIRES
    * [[lcCte]] (`hll_lc`) earlier in the same WITH chain — emit it once
    * per query however many estimates the query runs. */
  def estimateCtes(prefix: String, regs: String, groupCols: Seq[String],
      bits: Int, out: String): String = {
    val g = groupCols.mkString(", ")
    val maxRank = bits + 1
    val num = BigInt(7213) * BigInt(M).pow(3) * BigInt(2).pow(maxRank)
    val denom1 = 10L * (1000L * M + 1079L)
    val twoMax = BigInt(2).pow(maxRank).toString
    s"""${prefix}_e1 AS (
       |  SELECT $g, count(*) AS nb,
       |    sum((1::UBIGINT << ($maxRank - r))::HUGEINT) AS sp
       |  FROM $regs GROUP BY $g),
       |${prefix}_e2 AS (
       |  SELECT $g, $M - nb AS v,
       |    sp + ($M - nb)::HUGEINT * $twoMax::HUGEINT AS s
       |  FROM ${prefix}_e1),
       |${prefix}_e3 AS (
       |  SELECT $g, v, $num::HUGEINT // ($denom1::HUGEINT * s) AS eraw
       |  FROM ${prefix}_e2),
       |$prefix AS (
       |  SELECT $g,
       |    CASE WHEN eraw <= ${5L * M / 2L} AND e3.v > 0
       |      THEN lc.lcv
       |      ELSE CAST(eraw AS DOUBLE) END AS $out
       |  FROM ${prefix}_e3 e3 LEFT JOIN hll_lc lc ON lc.v = e3.v)"""
      .stripMargin
  }

  /** regs + estimate in one go (single-level groupings). */
  def sketchCtes(prefix: String, src: String, groupCols: Seq[String],
      bits: Int, out: String): String =
    regsCtes(s"${prefix}_regs", src, groupCols, bits) + ",\n" +
      estimateCtes(prefix, s"${prefix}_regs", groupCols, bits, out)
}
