package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType
import graft.Tables._
import graft.Fns._

/** Temporal joins the built-in operator set can't express directly:
  * as-of (each probe row matched to the latest build row at-or-before its
  * timestamp) and bounded-range (probe row joined to all build rows within
  * a fixed time band).
  *
  * Both avoid the naive O(probe × build-per-key) inequality join that a
  * theta-join would produce:
  *
  *  - `asofJoin` rewrites the problem as a UNION + running `last(…,
  *    ignoreNulls)` window: both sides shuffle ONCE on the equi-keys,
  *    interleave by timestamp, and every probe row reads the most recent
  *    build payload from window state. Cost is one shuffle + one
  *    per-partition sort — identical to the sessionization shape (q23)
  *    that already holds at 50× — and is independent of how many build
  *    rows precede each probe (a theta-join's matched-set is linear in
  *    that count before its argmax).
  *  - `q74` band-joins by bucketing both sides at the band width: the
  *    build side duplicates into (own bucket, next bucket) so every
  *    probe's candidates land in its own bucket, the join is a plain
  *    EQUI-join on (key, bucket) + a residual range filter. Shuffle
  *    volume is 2× build + 1× probe, regardless of band population;
  *    Catalyst sees an equi-join, so AQE/skew handling apply as usual.
  */
object TemporalJoins {

  /** Distributed as-of join (backward match, inclusive): for each `left`
    * row, attach the non-key columns of the latest `right` row with the
    * same `keys` and `right.tsCol <= left.tsCol`; unmatched rows keep
    * nulls (LEFT ASOF semantics).
    *
    * `right` must be unique per (keys, rightTs) — pre-aggregate ties
    * (e.g. `max(id)`) so the match is deterministic; window state per key
    * is a single payload struct, so memory is O(1) per key regardless of
    * history length. Hot keys concentrate in single partitions (inherent
    * to per-key ordering — same trade as any window/sessionize); at 100 TB
    * the mitigation is range-partitioning by (key, ts-range) with
    * boundary-row fixup, not salting.
    */
  def asofJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTs: String, rightTs: String): DataFrame = {
    val payloadCols = right.columns.filterNot(keys.contains)
    // The output is left.* ++ payloadCols, so a right payload name (incl.
    // rightTs) that collides with a left column would emit two columns of
    // the same name — every later col("name") then throws
    // AMBIGUOUS_REFERENCE. Fail at construction instead (q73 renames to
    // click_ts/click_id for exactly this reason).
    val clash = payloadCols.toSet intersect left.columns.toSet
    require(clash.isEmpty,
      s"asofJoin: right payload column(s) ${clash.mkString(", ")} collide " +
        "with left columns; rename the right side before joining")
    val lPart = left.select(
      keys.map(col) ++ Seq(
        col(leftTs).as("_ts"), lit(1).as("_side"),
        struct(left.columns.map(col).toIndexedSeq: _*).as("_l"),
        lit(null).cast(StructType(
          right.schema.fields.filterNot(f => keys.contains(f.name)))).as("_r")): _*)
    val rPart = right.select(
      keys.map(col) ++ Seq(
        col(rightTs).as("_ts"), lit(0).as("_side"),
        lit(null).cast(StructType(left.schema.fields)).as("_l"),
        struct(payloadCols.map(col).toIndexedSeq: _*).as("_r")): _*)
    // right rows sort BEFORE probe rows at equal ts (_side 0 < 1), so the
    // inclusive (>=) as-of bound falls out of the frame, not a filter
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("_ts").asc, col("_side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    lPart.unionByName(rPart)
      .withColumn("_m", last(col("_r"), ignoreNulls = true).over(w))
      .where(col("_side") === 1)
      .select(col("_l.*") +: payloadCols.map(c => col(s"_m.$c").as(c)): _*)
  }

  // ── q73: purchases as-of-joined to the user's latest prior click.
  //         Clicks pre-deduped per (user, ts) with max(event_id) so the
  //         match — and the DuckDB ASOF JOIN oracle — is deterministic.
  def q73(s: SparkSession, dir: String): DataFrame = {
    val ev = events(s, dir)
    val purchases = ev.where(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"), col("value"))
    val clicks = ev.where(col("event_type") === "click")
      .groupBy(col("user_id"), col("ts").as("click_ts"))
      .agg(max(col("event_id")).as("click_id"))
    asofJoin(purchases, clicks, Seq("user_id"), "ts", "click_ts")
      .withColumn("gap_us", unix_micros(col("ts")) - unix_micros(col("click_ts")))
      .orderBy(col("event_id"))
  }

  val q73Sql: String =
    """WITH purchases AS (
      |  SELECT event_id, user_id, ts, value FROM events
      |  WHERE event_type = 'purchase'),
      |clicks AS (
      |  SELECT user_id, ts AS click_ts, max(event_id) AS click_id
      |  FROM events WHERE event_type = 'click' GROUP BY 1, 2)
      |SELECT p.event_id, p.user_id, p.ts, p.value, c.click_id, c.click_ts,
      |  epoch_us(p.ts) - epoch_us(c.click_ts) AS gap_us
      |FROM purchases p ASOF LEFT JOIN clicks c
      |  ON p.user_id = c.user_id AND p.ts >= c.click_ts
      |ORDER BY p.event_id""".stripMargin

  // ── q74: bounded-range join — per error event, the count and value of
  //         the same user's clicks in the preceding 10 minutes
  //         (c.ts ∈ (e.ts − 10 min, e.ts]). Bucket width = band width, so
  //         each click lands in exactly 2 candidate buckets.

  private val BandUs = 600000000L // 10 min in µs

  def q74(s: SparkSession, dir: String): DataFrame = {
    val ev = events(s, dir)
    val errors = ev.where(col("event_type") === "error")
      .select(col("event_id"), col("user_id"), col("ts"),
        floor(unix_micros(col("ts")) / BandUs).as("_b"))
    val clicks = ev.where(col("event_type") === "click")
      .select(col("user_id").as("_cu"), col("ts").as("_cts"),
        col("value").as("_cv"),
        floor(unix_micros(col("ts")) / BandUs).as("_cb0"))
      .withColumn("_cb", explode(array(col("_cb0"), col("_cb0") + 1)))
      .drop("_cb0")
    errors.join(clicks,
        col("user_id") === col("_cu") && col("_b") === col("_cb") &&
        col("_cts") <= col("ts") &&
        unix_micros(col("ts")) - unix_micros(col("_cts")) < BandUs,
        "left")
      .groupBy(col("event_id"), col("user_id"), col("ts"))
      .agg(count(col("_cts")).as("n_clicks"),
        (coalesce(sum(cents(col("_cv"))), lit(0)) / 100.0).as("click_value"))
      .orderBy(col("event_id"))
  }

  val q74Sql: String =
    """SELECT e.event_id, e.user_id, e.ts,
      |  count(c.ts) AS n_clicks,
      |  coalesce(sum(round(c.value * 100)), 0) / 100.0 AS click_value
      |FROM events e LEFT JOIN events c
      |  ON c.user_id = e.user_id AND c.event_type = 'click'
      | AND c.ts <= e.ts AND epoch_us(e.ts) - epoch_us(c.ts) < 600000000
      |WHERE e.event_type = 'error'
      |GROUP BY 1, 2, 3 ORDER BY e.event_id""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q73_asof_join" -> q73,
    "q74_range_join" -> q74)

  val oracle: Map[String, String] = Map(
    "q73_asof_join" -> q73Sql,
    "q74_range_join" -> q74Sql)
}
