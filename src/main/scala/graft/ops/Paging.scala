package graft.ops

import java.nio.charset.StandardCharsets
import java.util.Base64
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/** Keyset pagination surface (SURVEY.md §2.3 F3, §2.6 O1/O2/O8, §2.8 X12)
  * — the /api/flights endpoint (api/app.py:60-181) as a parameterized
  * engine call. The cursor is an opaque base64 of the natural sort key
  * (api/app.py:46-58); the seek predicate pushes into the scan, so each
  * page costs O(page), never O(offset).
  */
object Paging {

  final case class Cursor(dateIso: String, key: Long)

  /** X12: cursor → opaque token ("date:key", base64). */
  def encodeCursor(c: Cursor): String =
    Base64.getEncoder.encodeToString(
      s"${c.dateIso}:${c.key}".getBytes(StandardCharsets.UTF_8))

  /** X12: opaque token → cursor; None on garbage (the reference 400s). */
  def decodeCursor(token: String): Option[Cursor] =
    try {
      val s = new String(Base64.getDecoder.decode(token), StandardCharsets.UTF_8)
      val i = s.lastIndexOf(':')
      if (i <= 0) None else Some(Cursor(s.substring(0, i), s.substring(i + 1).toLong))
    } catch { case _: RuntimeException => None }

  final case class Page(rows: Array[Row], total: Long, nextCursor: Option[String])

  /** One page of a keyset scan over (dateCol, keyCol), with filters already
    * applied by the caller. Two actions on one cached filtered plan: the
    * page (TakeOrderedAndProject) and the total count (the reference
    * recomputes the total per request, api/app.py:177 — same semantics,
    * shared plan).
    */
  def page(filtered: DataFrame, dateCol: String, keyCol: String,
      cursor: Option[Cursor], limit: Int, maxLimit: Int = 1000): Page = {
    val n = math.min(limit, maxLimit) // api/app.py:131 clamp
    val seeked = cursor.fold(filtered) { c =>
      filtered.filter(col(dateCol) > to_timestamp(lit(c.dateIso)) ||
        (col(dateCol) === to_timestamp(lit(c.dateIso)) && col(keyCol) > c.key))
    }
    val rows = seeked.orderBy(col(dateCol), col(keyCol)).limit(n).collect()
    val next = rows.lastOption.filter(_ => rows.length == n).map { last =>
      encodeCursor(Cursor(
        last.getAs[Any](dateCol) match {
          case t: java.sql.Timestamp => t.toLocalDateTime.toString.replace('T', ' ')
          case d: java.time.LocalDateTime => d.toString.replace('T', ' ')
          case other => other.toString
        },
        last.getAs[Long](keyCol)))
    }
    Page(rows, filtered.count(), next)
  }
}
