package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Cross-engine float-parity helpers (SURVEY.md §7.5 "oracle parity traps").
  *
  * The driver hash-compares our parquet output against DuckDB running the
  * oracle SQL on the same inputs. Double aggregation is order-dependent in
  * the last ULP, and Spark's `round(double, s)` (BigDecimal.valueOf → shortest
  * decimal repr → HALF_UP) disagrees with DuckDB's (scale-multiply → round)
  * exactly on ".xx5"-shortest-repr doubles. Two rules make results
  * bit-identical instead of merely close:
  *
  *  1. Sum decimal-valued doubles as exact integer "cents":
  *     `sum(round(x * 100))` — integer-valued doubles add exactly in any
  *     order (until 2^53), so the sum is associative and engine-identical.
  *  2. Express rounding as `round(x * 10^s) / 10^s` in BOTH engines:
  *     scale-0 rounding agrees between Spark and DuckDB for all doubles
  *     (both round-half-away-from-zero on exact .5; identical bits otherwise).
  *
  * Every oracle SQL string in SparkEntry mirrors these formulas token for
  * token (same association order), so the doubles match bit-for-bit.
  */
object Fns {
  /** Engine-portable round to 2 decimals: round(x*100)/100. */
  def round2(c: Column): Column = round(c * 100) / 100.0

  /** Engine-portable round to 4 decimals. */
  def round4(c: Column): Column = round(c * 10000) / 10000.0

  /** Engine-portable round to 6 decimals. */
  def round6(c: Column): Column = round(c * 1000000) / 1000000.0

  /** Money value → exact integer cents (order-independent summation). */
  def cents(c: Column): Column = round(c * 100)

  /** Exact sum of a 2-decimal money column. */
  def sumMoney(c: Column): Column = sum(cents(c)) / 100.0

  /** Exact mean of a 2-decimal money column: sum_cents / n / 100. */
  def avgMoney(c: Column): Column = sum(cents(c)) / count(lit(1)) / 100.0

  /** a / b * 100 rounded to 2 decimals, null-safe on b = 0 (Spark divides
    * to null; Postgres/DuckDB error — normalize with an explicit guard,
    * SURVEY.md §2.5 A9). */
  def pct2(a: Column, b: Column): Column =
    when(b =!= 0, round2(a / b * 100)).otherwise(lit(null).cast("double"))
}
