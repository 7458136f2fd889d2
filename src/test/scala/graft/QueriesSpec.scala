package graft

import org.apache.spark.sql.functions._

/** Contract-level checks: every registered query runs on sf0.001 and the
  * oracle map is consistent with the query map. Value-level correctness is
  * enforced by the DuckDB oracle (tools/check_oracle.py, driver-run). */
class QueriesSpec extends SparkTestBase {

  test("entry returns rows on sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracle key has a query") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracle without query: $missing")
  }

  test("all queries execute and are non-empty on sf0.001") {
    // q19/q26-style anti joins can legitimately shrink, but none should be
    // empty at sf0.001 with the chosen predicates — empty output would make
    // the driver's rows-only check meaningless.
    val allowEmpty = Set("q33_dedup_jaccard", "q34_dedup_minhash")
    SparkEntry.queries.foreach { case (name, fn) =>
      val df = fn(spark, sfDir)
      assert(df.columns.nonEmpty, s"$name has no columns")
      val n = df.count()
      if (!allowEmpty(name)) assert(n > 0, s"$name returned 0 rows")
    }
  }

  test("q01 pricing summary has the 6 flag/status groups with exact counts") {
    val rows = graft.ops.RefQueries.q01(spark, sfDir)
      .select("l_returnflag", "l_linestatus", "count_order").collect()
    assert(rows.length == 6)
    val total = rows.map(_.getLong(2)).sum
    val liCount = Tables.lineitem(spark, sfDir)
      .filter(col("l_shipdate") <= to_timestamp(lit("2001-09-02 00:00:00")))
      .count()
    assert(total == liCount, "group counts must partition the filtered table")
  }

  test("q08 pagination: page rows all satisfy the cursor predicate and are sorted") {
    val rows = graft.ops.RefQueries.q08(spark, sfDir)
      .select(date_format(col("o_orderdate"), "yyyy-MM-dd HH:mm:ss"),
        col("o_orderkey")).collect()
    assert(rows.nonEmpty && rows.length <= 100)
    val keys = rows.map(r => (r.getString(0), r.getLong(1)))
    assert(keys.sameElements(keys.sorted), "page must be sorted by (date, key)")
  }

  test("q07 union-distinct: airports contain both supp and part key domains") {
    val airports = graft.ops.RefQueries.q07(spark, sfDir).collect().map(_.getLong(0)).toSet
    val supp = Tables.lineitem(spark, sfDir).select("l_suppkey").distinct()
      .collect().map(_.getLong(0)).toSet
    assert(supp.subsetOf(airports))
  }
}
