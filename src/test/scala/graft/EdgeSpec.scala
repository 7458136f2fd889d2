package graft

import java.nio.file.Files

/** Edge hardening: every registered query must execute (not necessarily
  * return rows) against EMPTY inputs with the production schemas — the
  * shape of a fresh partition, a fully-filtered date slice, or a cold
  * bootstrap at scale. Catches empty-group division, min/max-on-empty,
  * and missing-broadcast-row crashes. */
class EdgeSpec extends SparkTestBase {

  private lazy val emptyDir: String = {
    val dir = Files.createTempDirectory("sf_empty").toString
    graft.sql.Views.tableNames.foreach { t =>
      val src =
        if (t == "events") Tables.events(spark, sfDir)
        else Tables.table(spark, sfDir, t)
      src.limit(0).write.mode("overwrite").parquet(s"$dir/$t.parquet")
    }
    dir
  }

  test("all queries execute on empty fixtures without throwing") {
    val failures = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        try { fn(spark, emptyDir).count(); None }
        catch { case e: Throwable => Some(s"$name: ${e.getMessage.take(150)}") }
    }
    assert(failures.isEmpty, failures.mkString("\n"))
  }

  test("paging on an empty filtered set returns an empty page, no cursor") {
    val p = graft.ops.Paging.page(
      Tables.orders(spark, emptyDir), "o_orderdate", "o_orderkey", None, 10)
    assert(p.rows.isEmpty && p.total == 0 && p.nextCursor.isEmpty)
  }
}
