package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.TopKPerKey

class TopKPerKeySpec extends SparkTestBase {

  test("TopKPerKey ≡ window row_number form, row for row") {
    val orders = Tables.orders(spark, sfDir)
    val custom = TopKPerKey.of(orders,
        keys = Seq("o_orderpriority"),
        orderBy = Seq("o_totalprice" -> false, "o_orderkey" -> true),
        k = 3)
      .select("o_orderpriority", "o_orderkey", "o_totalprice")
      .orderBy("o_orderpriority", "o_orderkey")
      .collect().toSeq
    val viaWindow = graft.ops.Windows.q21(spark, sfDir)
      .select("o_orderpriority", "o_orderkey", "o_totalprice")
      .orderBy("o_orderpriority", "o_orderkey")
      .collect().toSeq
    assert(custom == viaWindow)
  }

  test("plan: one exchange, no Sort or Window operator") {
    val orders = Tables.orders(spark, sfDir)
    val df = TopKPerKey.of(orders, Seq("o_orderpriority"),
      Seq("o_totalprice" -> false, "o_orderkey" -> true), 3)
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("TopKPerKey"), p) // exec node renders without Exec suffix
    assert(p.split("Exchange").length - 1 == 1, "exactly one shuffle\n" + p)
    assert(!p.contains("Window"), "must not fall back to a window\n" + p)
    assert(!p.contains("Sort "), "must not sort partitions\n" + p)
  }

  test("groups with fewer than k rows are kept whole; ties break by order") {
    import spark.implicits._
    val df = Seq(("a", 3), ("a", 1), ("a", 2), ("a", 5), ("b", 9))
      .toDF("k", "v")
    val out = TopKPerKey.of(df, Seq("k"), Seq("v" -> true), 2)
      .collect().map(r => (r.getString(0), r.getInt(1))).toSet
    assert(out == Set(("a", 1), ("a", 2), ("b", 9)))
  }

  test("k larger than any group returns everything") {
    val li = Tables.lineitem(spark, sfDir).limit(100)
    val out = TopKPerKey.of(li, Seq("l_returnflag"),
      Seq("l_orderkey" -> true, "l_linenumber" -> true), 1000)
    assert(out.count() == 100)
  }
}
