package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables._

/** Set-operation family (SURVEY.md §2.7): the reference only has the
  * union-distinct (U1, covered by q07); EXCEPT/INTERSECT complete the
  * algebra. Spark plans these as left-anti / left-semi + distinct — no
  * wider shuffle than the equivalent join.
  */
object SetOps {

  // ── q26: EXCEPT — customer keys that never appear in orders placed
  //         before 1996 (kept non-empty at every sf).
  def q26(s: SparkSession, dir: String): DataFrame =
    customer(s, dir).select(col("c_custkey"))
      .except(
        orders(s, dir)
          .filter(col("o_orderdate") < to_timestamp(lit("1996-01-01 00:00:00")))
          .select(col("o_custkey").as("c_custkey")))
      .orderBy(col("c_custkey"))

  val q26Sql: String =
    """SELECT c_custkey FROM customer
      |EXCEPT
      |SELECT o_custkey AS c_custkey FROM orders
      |WHERE o_orderdate < TIMESTAMP '1996-01-01 00:00:00'
      |ORDER BY c_custkey""".stripMargin

  // ── q27: INTERSECT — nation keys present among both suppliers and
  //         customers. Both sides int32 (n_nationkey domain).
  def q27(s: SparkSession, dir: String): DataFrame =
    supplier(s, dir).select(col("s_nationkey").as("nationkey"))
      .intersect(customer(s, dir).select(col("c_nationkey").as("nationkey")))
      .orderBy(col("nationkey"))

  val q27Sql: String =
    """SELECT s_nationkey AS nationkey FROM supplier
      |INTERSECT
      |SELECT c_nationkey AS nationkey FROM customer
      |ORDER BY nationkey""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q26_except" -> q26,
    "q27_intersect" -> q27)

  val oracle: Map[String, String] = Map(
    "q26_except" -> q26Sql,
    "q27_intersect" -> q27Sql)
}
