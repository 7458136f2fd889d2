package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables._
import graft.Fns._

/** CDC-style merge (SCD type 1 upsert): base ∪ updates, highest version
  * per key wins — the batch shape of `MERGE INTO` for engines/format
  * layers that lack it. One shuffle on the key; the per-key winner is a
  * bounded window (each key carries its base row + however many update
  * rows arrived this batch, typically ≤ a few). At 100 TB the base side
  * would be bucketed/partitioned by the merge key so only the touched
  * partitions rewrite (the Delta/Iceberg copy-on-write trade); the
  * operator itself is unchanged.
  */
object Merge {

  /** Latest-version-per-key merge of `base` and `updates` (same schema +
    * a numeric version column; higher wins, base supplies the floor). */
  def upsertLatest(base: DataFrame, updates: DataFrame,
      keys: Seq[String], versionCol: String): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(versionCol).desc)
    base.unionByName(updates)
      .withColumn("_rk", row_number().over(w))
      .where(col("_rk") === 1)
      .drop("_rk")
  }

  // ── q79: upsert a deterministic update batch (every 10th order gets a
  //        status flip + a 100.00 price bump) into orders, then audit the
  //        merged state per status. Exact-cents arithmetic keeps the
  //        updated prices and the audit sums bit-equal cross-engine.
  def q79(s: SparkSession, dir: String): DataFrame = {
    val o = orders(s, dir)
    val base = o.select(col("o_orderkey"), col("o_orderstatus"),
      col("o_totalprice"), lit(0).as("_v"))
    val updates = o.where(col("o_orderkey") % 10 === 0)
      .select(col("o_orderkey"), lit("U").as("o_orderstatus"),
        ((cents(col("o_totalprice")) + 10000) / 100.0).as("o_totalprice"),
        lit(1).as("_v"))
    upsertLatest(base, updates, Seq("o_orderkey"), "_v")
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n"),
        (sum(cents(col("o_totalprice"))) / 100.0).as("total"))
      .orderBy(col("o_orderstatus"))
  }

  val q79Sql: String =
    """WITH base AS (
      |  SELECT o_orderkey, o_orderstatus, o_totalprice, 0 AS _v FROM orders),
      |updates AS (
      |  SELECT o_orderkey, 'U' AS o_orderstatus,
      |    round(o_totalprice * 100 + 10000) / 100.0 AS o_totalprice, 1 AS _v
      |  FROM orders WHERE o_orderkey % 10 = 0),
      |merged AS (
      |  SELECT *, row_number() OVER (
      |    PARTITION BY o_orderkey ORDER BY _v DESC) AS _rk
      |  FROM (SELECT * FROM base UNION ALL SELECT * FROM updates))
      |SELECT o_orderstatus, count(*) AS n,
      |  sum(round(o_totalprice * 100)) / 100.0 AS total
      |FROM merged WHERE _rk = 1 GROUP BY 1 ORDER BY o_orderstatus""".stripMargin

  /** SCD type-2 history from a change stream: collapse CONSECUTIVE equal
    * attribute values per key (ts order, tie-broken on `tieBreak`), then
    * give each surviving run a [valid_from, valid_to) range and an
    * is_current marker — the dimension-history shape `MERGE INTO …
    * WHEN MATCHED` builds incrementally, derived here in one pass.
    *
    * Two windows over the SAME (key, ts, tieBreak) ordering ⇒ one hash
    * shuffle + one sort, reused by both (the change filter is narrow).
    * Per-key state is O(1) (lag/lead), so skew exposure is bounded by the
    * largest single key's history, not the table.
    */
  def scd2History(changes: DataFrame, key: String, attr: String,
      ts: String, tieBreak: String): DataFrame = {
    val w = Window.partitionBy(col(key)).orderBy(col(ts), col(tieBreak))
    changes
      .withColumn("_prev", lag(col(attr), 1).over(w))
      // IS DISTINCT FROM: first row per key (null _prev) starts a run
      .where(!(col("_prev") <=> col(attr)))
      .withColumn("valid_to", lead(col(ts), 1).over(w))
      .select(col(key), col(attr), col(ts).as("valid_from"),
        col("valid_to"), col("valid_to").isNull.as("is_current"))
  }

  // ── q100: SCD2 dimension history of each user's event_type track
  //         (users < 50 bound the audit slice; the operator is
  //         key-partitioned and runs at any width).
  def q100(s: SparkSession, dir: String): DataFrame = {
    val e = events(s, dir).where(col("user_id") < 50)
      .select(col("user_id"), col("event_type"), col("ts"), col("event_id"))
    scd2History(e, "user_id", "event_type", "ts", "event_id")
      .orderBy(col("user_id"), col("valid_from"), col("event_type"))
  }

  val q100Sql: String =
    """WITH e AS (
      |  SELECT user_id, event_type, ts, event_id
      |  FROM events WHERE user_id < 50),
      |marked AS (
      |  SELECT *, lag(event_type) OVER w AS _prev FROM e
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
      |runs AS (
      |  SELECT user_id, event_type, ts, event_id FROM marked
      |  WHERE _prev IS DISTINCT FROM event_type)
      |SELECT user_id, event_type, ts AS valid_from,
      |  lead(ts) OVER w AS valid_to,
      |  (lead(ts) OVER w IS NULL) AS is_current
      |FROM runs
      |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
      |ORDER BY user_id, valid_from, event_type""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q79_merge_upsert" -> q79,
    "q100_scd2_history" -> q100)

  val oracle: Map[String, String] = Map(
    "q79_merge_upsert" -> q79Sql,
    "q100_scd2_history" -> q100Sql)
}
