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

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q79_merge_upsert" -> q79)

  val oracle: Map[String, String] = Map(
    "q79_merge_upsert" -> q79Sql)
}
