package graft

import org.apache.spark.sql.functions._
import graft.ops.Paging
import graft.ops.Paging.Cursor

class PagingSpec extends SparkTestBase {

  test("X12: cursor codec round-trips; garbage decodes to None") {
    val c = Cursor("1997-06-01 00:00:00", 9000L)
    assert(Paging.decodeCursor(Paging.encodeCursor(c)).contains(c))
    assert(Paging.decodeCursor("!!!not-base64!!!").isEmpty)
    assert(Paging.decodeCursor(
      java.util.Base64.getEncoder.encodeToString("nocolon".getBytes)).isEmpty)
  }

  test("pages partition the filtered set: no duplicates, no loss, in order") {
    val filtered = Tables.orders(spark, sfDir)
      .filter(col("o_orderstatus") === "O")
    val expected = filtered.orderBy(col("o_orderdate"), col("o_orderkey"))
      .select("o_orderkey").collect().map(_.getLong(0)).toSeq

    var cursor: Option[Cursor] = None
    val seen = Seq.newBuilder[Long]
    var pages = 0
    var done = false
    while (!done && pages < 1000) {
      val p = Paging.page(filtered, "o_orderdate", "o_orderkey", cursor, 37)
      seen ++= p.rows.map(_.getAs[Long]("o_orderkey"))
      pages += 1
      assert(p.total == expected.length) // total stable across pages
      p.nextCursor.flatMap(Paging.decodeCursor) match {
        case some @ Some(_) if p.rows.nonEmpty => cursor = some
        case _ => done = true
      }
    }
    assert(seen.result() == expected, "pages must partition the sorted set")
  }

  test("limit clamps to maxLimit like the reference") {
    val filtered = Tables.orders(spark, sfDir)
    val p = Paging.page(filtered, "o_orderdate", "o_orderkey", None,
      limit = 999999, maxLimit = 50)
    assert(p.rows.length == 50)
  }
}
