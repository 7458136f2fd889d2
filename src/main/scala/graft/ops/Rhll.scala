package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Replayable HyperLogLog — plain-SQL HLL whose registers and estimate are
  * deterministic functions of a 64-bit hash, so a DuckDB oracle can replay
  * them bit-for-bit (`graft.sql.HllSql`). This is the sketch engine behind
  * q152–q155: the Datasketches `hll_sketch_agg` they previously used is
  * opaque binary state no second engine can reproduce, which left the whole
  * family rows-only; these registers are just rows.
  *
  * Construction (classic HLL, Flajolet–Fuchs–Gandouet–Meunier 2007; the
  * raw-estimate constant alpha_m and the 2.5·m linear-counting cutover are
  * the published values — no empirical HLL++ bias table, so both engines
  * can compute the estimate in closed form):
  *   - p = 12 → m = 4096 registers; bucket = top 12 bits of the hash.
  *   - rank = leading-zero count of the remaining `bits` hash bits + 1
  *     (an all-zero suffix ranks bits+1), computed EXACTLY on both engines
  *     as `bits + 1 - bitlength(suffix)` via `length(bin(x))` — no
  *     floating log2.
  *   - a "sketch" is the relation (group…, bucket, r=max rank): merging
  *     sketches is `max(r)` per bucket — associative, commutative,
  *     shuffle-light (≤ m rows per group however many rows it summarizes),
  *     and identical to sketching the unioned input. That relational form
  *     is the whole point at 100 TB: daily ledgers persist as ≤ m plain
  *     parquet rows per group, and month-distinct is a max-merge that
  *     never re-touches raw events.
  *   - estimate: raw = alpha_m·m²/Σ 2^-M_j with the division done in
  *     EXACT integer arithmetic (alpha_m as the rational
  *     7213·m / (10·(1000·m+1079)); register terms scaled by 2^maxRank and
  *     summed as DECIMAL(38,0) — up to m·2^maxRank ≈ 2^65 overflows BIGINT);
  *     below 2.5·m with empty registers it falls back to linear counting
  *     m·ln(m/V), served from the PRECOMPUTED [[lcX1e4]] table (round-4
  *     fixed-point, same literals in both engines) so no engine-local
  *     ln() ever runs on the estimate path.
  */
object Rhll {
  /** Register-index bits: m = 2^P registers (±1.04/√m ≈ 1.6% std error). */
  val P = 12
  val M: Long = 1L << P

  /** Linear-counting estimates PRECOMPUTED: round4(m·ln(m/V))·10^4 as exact
    * integers for V in 1..m−1 (V = empty registers; V ≥ 1 whenever the
    * branch fires, V ≤ m−1 because a present group owns ≥ 1 register).
    * ln() was the one floating-point step shared with the DuckDB oracle —
    * JVM Math.log and libm log are not guaranteed identically rounded, so
    * a 1-ulp difference could flip the round-4 output on a knife-edge
    * value. Computing the table ONCE here and embedding the SAME literals
    * in both plans (typedlit below; HllSql.lcCte on the oracle side)
    * eliminates the divergence structurally: both engines only ever
    * divide the same exact integer by 10^4. */
  val lcX1e4: IndexedSeq[Int] = (1 until M.toInt).map { v =>
    java.math.BigDecimal.valueOf(M.toDouble * math.log(M.toDouble / v))
      .setScale(4, java.math.RoundingMode.HALF_UP)
      .movePointRight(4).intValueExact()
  }
  private val lcRows: Seq[(Int, Double)] =
    lcX1e4.indices.map(i => (i + 1, lcX1e4(i) / 10000.0))

  /** Register index: top P bits of the 64-bit hash. For a value narrower
    * than 64 bits (e.g. the 60-bit md5 prefix), pass its suffix width as
    * `bits` here and in [[rank]]/[[estimate]] — bucket = value >>> bits. */
  def bucket(h: Column, bits: Int = 64 - P): Column =
    shiftrightunsigned(h, bits)

  /** Leading-zero rank of the low `bits` hash bits, in 1..bits+1.
    * bitlength via bin() is exact integer arithmetic in both engines. */
  def rank(h: Column, bits: Int = 64 - P): Column = {
    val suffix = h.bitwiseAND(lit((1L << bits) - 1L))
    when(suffix === lit(0L), lit(bits + 1))
      .otherwise(lit(bits + 1) - length(bin(suffix)))
  }

  /** Per-group estimate over a register relation (groupCols… + `r`, one row
    * per present bucket, r = max rank in 1..bits+1). Output: groupCols… +
    * `out` (DOUBLE; integer-exact on the raw path, round-4 fixed-point on
    * the linear-counting path). Mirrored token-for-token by
    * `HllSql.estimateCtes`. */
  def estimate(registers: DataFrame, groupCols: Seq[String], bits: Int,
      out: String): DataFrame = {
    val maxRank = bits + 1
    // alpha_m·m²·2^maxRank as one exact integer literal (~2^101 for
    // bits=52 — DECIMAL(38,0) holds it; a BIGINT would overflow)
    val num = BigInt(7213) * BigInt(M).pow(3) * BigInt(2).pow(maxRank)
    val denom1 = 10L * (1000L * M + 1079L) // alpha_m's rational denominator
    registers.groupBy(groupCols.map(col): _*)
      .agg(
        sum(expr(s"CAST(shiftleft(CAST(1 AS BIGINT), $maxRank - r) AS DECIMAL(38,0))"))
          .as("_sp"),
        count(lit(1)).as("_nb"))
      .withColumn("_v", lit(M) - col("_nb"))
      .withColumn("_s", col("_sp") +
        col("_v").cast("decimal(38,0)") *
          expr(s"CAST(${BigInt(2).pow(maxRank)} AS DECIMAL(38,0))"))
      // exact integral raw estimate: floor(alpha·m²·2^maxRank / S_scaled)
      .withColumn("_eraw",
        expr(s"CAST('$num' AS DECIMAL(38,0)) div (CAST($denom1 AS DECIMAL(38,0)) * _s)"))
      // precomputed lcX1e4 lookup via a BROADCAST JOIN against the tiny
      // (m−1)-row table — the oracle's hll_lc CTE shape. An
      // element_at(typedlit(...)) literal re-embedded the 4095-element
      // array into every estimate site's analyzed plan and codegen
      // constant pool (r12 advice); as a joined relation the table lives
      // once in a broadcast, not in the expression tree. Left join: _v=0
      // (no empty registers) misses, but the raw branch fires there.
      .join(broadcast(
          registers.sparkSession.createDataFrame(lcRows).toDF("_lcv", "_lc")),
        col("_v") === col("_lcv"), "left")
      .withColumn(out,
        when(col("_eraw") <= lit(5L * M / 2L) && col("_v") > 0L, col("_lc"))
          .otherwise(col("_eraw").cast("double")))
      .drop("_sp", "_nb", "_v", "_s", "_eraw", "_lcv", "_lc")
  }
}
